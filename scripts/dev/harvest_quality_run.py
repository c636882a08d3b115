"""Recover the quality-run PSNR curve from a (possibly still-running
or killed) train_quality_run.py workdir.

train_quality_run.py only writes experiments/quality_run_r2/ after the
full run returns; if the process is interrupted, the evidence so far
lives only in the experiment log inside its temp workdir. This tool
harvests that log into the same curve.jsonl/summary.json artifacts so
a partial run is still committable.

Safety rails: --tiny plumbing-check runs use a distinct workdir prefix
(edvr_quality_tiny_) and are never picked up by the default glob; on
top of that the harvester reads the workdir's opt.yml and refuses to
overwrite the committed artifacts with non-production model dims
unless --force is given.

Usage: python scripts/dev/harvest_quality_run.py [workdir] [--force]
       (default: newest /tmp/edvr_quality_* excluding tiny runs)
"""

import glob
import json
import os
import os.path as osp
import re
import sys

REPO = osp.join(osp.dirname(osp.abspath(__file__)), '..', '..')


def parse_curve(log_dir):
    """Extract {'iter', 'psnr'} points from the experiment logs.

    The validation header carries its own iteration
    ('Validation <name> (iter N)'), so points are exact; logs from
    before that header existed fall back to the last train-progress
    iter, which can lag by up to print_freq.
    """
    curve = []
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith('.log'):
            continue
        with open(osp.join(log_dir, name)) as fh:
            it = None
            exact = False
            for line in fh:
                mv = re.search(r'Validation .*\(iter ([\d,]+)\)', line)
                if mv:
                    it = int(mv.group(1).replace(',', ''))
                    exact = True
                elif not exact:
                    mi = re.search(r'iter:\s*([\d,]+),', line)
                    if mi:
                        it = int(mi.group(1).replace(',', ''))
                mp = re.search(r'# psnr: ([\d.]+)', line)
                if mp and it is not None:
                    curve.append({'iter': it, 'psnr': float(mp.group(1))})
                    exact = False
    return curve


def main():
    args = [a for a in sys.argv[1:] if a != '--force']
    force = '--force' in sys.argv[1:]
    if args:
        workdir = args[0]
    else:
        cands = [c for c in glob.glob('/tmp/edvr_quality_*')
                 if not osp.basename(c).startswith('edvr_quality_tiny_')]
        cands = sorted(cands, key=os.path.getmtime)
        if not cands:
            sys.exit('no /tmp/edvr_quality_* workdir found')
        workdir = cands[-1]

    # refuse to harvest a non-production config over the committed
    # artifacts: a --tiny smoke (16-feat net) would silently
    # misrepresent the quality evidence
    opt_path = osp.join(workdir, 'opt.yml')
    name = 'quality_run_r2'
    if osp.isfile(opt_path):
        import yaml
        with open(opt_path) as fh:
            opt = yaml.safe_load(fh)
        name = opt.get('name', name)
        feat = opt.get('network_g', {}).get('num_feat')
        if feat != 64 and not force:
            sys.exit(f'{workdir} trains num_feat={feat}, not the '
                     'production 64-feat EDVR-M — refusing to overwrite '
                     f'experiments/{name} (use --force to harvest '
                     'anyway)')
    elif not force:
        sys.exit(f'{workdir} has no opt.yml to verify the config '
                 '(use --force to harvest anyway)')

    log_dir = osp.join(workdir, 'experiments', name)
    if not osp.isdir(log_dir):
        sys.exit(f'{workdir} has no experiments/{name} yet '
                 '(run killed before the trainer created it?)')
    curve = parse_curve(log_dir)
    if not curve:
        sys.exit(f'no validation points found in {log_dir}')

    out_dir = osp.join(REPO, 'experiments', name)
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
