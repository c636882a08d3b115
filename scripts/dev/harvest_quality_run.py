"""Recover the quality-run PSNR curve from a (possibly still-running
or killed) train_quality_run.py workdir.

train_quality_run.py only writes experiments/quality_run_r2/ after the
full run returns; if the process is interrupted, the evidence so far
lives only in the experiment log inside its temp workdir. This tool
harvests that log into the same curve.jsonl/summary.json artifacts so
a partial run is still committable.

Usage: python scripts/dev/harvest_quality_run.py [workdir]
       (default: newest /tmp/edvr_quality_*)
"""

import glob
import json
import os
import os.path as osp
import re
import sys

REPO = osp.join(osp.dirname(osp.abspath(__file__)), '..', '..')


def main():
    if len(sys.argv) > 1:
        workdir = sys.argv[1]
    else:
        cands = sorted(glob.glob('/tmp/edvr_quality_*'),
                       key=os.path.getmtime)
        if not cands:
            sys.exit('no /tmp/edvr_quality_* workdir found')
        workdir = cands[-1]
    log_dir = osp.join(workdir, 'experiments', 'quality_run_r2')
    curve = []
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith('.log'):
            continue
        with open(osp.join(log_dir, name)) as fh:
            it = None
            for line in fh:
                mi = re.search(r'iter:\s*([\d,]+),', line)
                if mi:
                    it = int(mi.group(1).replace(',', ''))
                mp = re.search(r'# psnr: ([\d.]+)', line)
                if mp and it is not None:
                    curve.append({'iter': it, 'psnr': float(mp.group(1))})
    if not curve:
        sys.exit(f'no validation points found in {log_dir}')

    out_dir = osp.join(REPO, 'experiments', 'quality_run_r2')
    os.makedirs(out_dir, exist_ok=True)
    with open(osp.join(out_dir, 'curve.jsonl'), 'w') as fh:
        for pt in curve:
            fh.write(json.dumps(pt) + '\n')
    summary = {
        'note': f'harvested from in-progress run at {workdir}',
        'iters_reached': curve[-1]['iter'],
        'final_psnr': round(curve[-1]['psnr'], 3),
    }
    with open(osp.join(out_dir, 'summary.json'), 'w') as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary))


if __name__ == '__main__':
    main()
