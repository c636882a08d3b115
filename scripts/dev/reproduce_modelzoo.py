"""One-command rehearsal of the ModelZoo REDS4 reproduction chain.

The reference publishes EDVR-M x4 SR at 30.53 dB on REDS4
(reference docs/ModelZoo.md:105, protocol
options/train/EDVR/train_EDVR_M_x4_SR_REDS.yml:98-102). The real REDS
dataset and the official checkpoint are absent in this environment
(PARITY.md), so this script rehearses every code link in the chain so
that the day the artifacts exist the gate is a single command:

  official-format .pth
    -> scripts/model_conversion/convert_official.py  (key remap + flax
       layout import -> net_g.ckpt)
    -> golden forward check (converted flax forward vs the
       reference-generated output committed in
       tests/data/golden/arch_edvr_m_full.npz, atol 3e-4)
    -> ``python -m edvr_tpu.test`` under the REDS4 protocol
       (VideoTestDataset, num_frame 5, reflection_circle padding,
       per-clip PSNR/SSIM)
    -> ModelZoo-style table.

Without --pth, an official-format EDVR_M .pth is SYNTHESIZED from the
committed golden fixture: the fixture holds the real torch module's
BasicSR-keyed weights, which edvr_to_official (the inverse of the
reference's convert_models.py mapping) renames to original-EDVR-repo
keys — exactly the format of the published checkpoint. Without
--dataroot, synthetic REDS4-protocol clips stand in for REDS
(metric values are then meaningless; the chain is what is rehearsed).

Usage:
  python scripts/dev/reproduce_modelzoo.py                  # rehearsal
  python scripts/dev/reproduce_modelzoo.py \
      --pth EDVR_REDS_SR_M.pth --dataroot /data/REDS4       # real gate
"""

import argparse
import json
import os
import os.path as osp
import subprocess
import sys
import tempfile

import numpy as np

REPO = osp.join(osp.dirname(osp.abspath(__file__)), '..', '..')
sys.path.insert(0, REPO)

os.environ.setdefault('EDVR_TPU_PLATFORM', 'cpu')

FIXTURE = osp.join(REPO, 'tests', 'data', 'golden',
                   'arch_edvr_m_full.npz')
REDS4_CLIPS = ('000', '011', '015', '020')  # the REDS4 split


def synthesize_official_pth(out_pth):
    """Golden fixture (BasicSR keys) -> original-EDVR-repo .pth."""
    import torch

    from edvr_tpu.convert.official import edvr_to_official

    fx = np.load(FIXTURE)
    state, skipped = {}, []
    for k in fx.files:
        if k.startswith('__'):
            continue
        ok = edvr_to_official(k)
        if ok is None:
            skipped.append(k)
            continue
        state[ok] = torch.from_numpy(fx[k])
    if skipped:
        sys.exit(f'fixture keys without an official name: {skipped}')
    torch.save(state, out_pth)
    cfg = json.loads(bytes(fx['__config__']).decode())
    return cfg, fx['__input__'], fx['__output__']


def convert(pth, arch_args, out_ckpt):
    """Run the real conversion CLI (the rehearsed link)."""
    arch_args = {k: v for k, v in arch_args.items() if k != 'type'}
    cmd = [sys.executable,
           osp.join(REPO, 'scripts', 'model_conversion',
                    'convert_official.py'),
           '--source', 'EDVR', '--arch', 'EDVR',
           '--arch_args', json.dumps(arch_args),
           '--pth', pth, '--out', out_ckpt]
    env = dict(os.environ, EDVR_TPU_PLATFORM='cpu')
    subprocess.run(cmd, check=True, env=env)


def golden_forward_check(ckpt, cfg, inp_nchw, want_nchw, atol=3e-4):
    import jax.numpy as jnp

    from edvr_tpu.archs import define_network
    from edvr_tpu.models.base_model import load_checkpoint

    net = define_network(dict(cfg))
    variables = load_checkpoint(ckpt)
    x = jnp.asarray(np.transpose(inp_nchw, (0, 1, 3, 4, 2)))
    got = np.transpose(np.asarray(net.apply(variables, x)), (0, 3, 1, 2))
    err = float(np.abs(got - want_nchw).max())
    status = 'OK' if err < atol else 'FAIL'
    print(f'[golden] converted-ckpt forward vs reference output: '
          f'max|err| = {err:.2e} ({status}, atol {atol})')
    if err >= atol:
        sys.exit(1)


def make_synthetic_reds4(root, lq_hw=32, frames=8, scale=4):
    import cv2
    rng = np.random.RandomState(0)
    for clip in REDS4_CLIPS:
        os.makedirs(osp.join(root, 'GT', clip))
        os.makedirs(osp.join(root, 'LQ', clip))
        for f in range(frames):
            gt = rng.randint(0, 256, (lq_hw * scale, lq_hw * scale, 3),
                             np.uint8)
            cv2.imwrite(osp.join(root, 'GT', clip, f'{f:08d}.png'), gt)
            cv2.imwrite(
                osp.join(root, 'LQ', clip, f'{f:08d}.png'),
                cv2.resize(gt, (lq_hw, lq_hw),
                           interpolation=cv2.INTER_AREA))


def run_reds4_test_cli(ckpt, cfg, gt_root, lq_root, workdir):
    """REDS4 protocol (reference options/test/EDVR/...): num_frame 5,
    reflection_circle padding, frame-wise RGB PSNR, no border crop."""
    import yaml

    opt = {
        'name': 'EDVR_M_x4_SR_REDS_modelzoo', 'model_type': 'EDVRModel',
        'scale': 4, 'num_gpu': 1, 'manual_seed': 0,
        'datasets': {'test_1': dict(
            name='REDS4', type='VideoTestDataset',
            dataroot_gt=gt_root, dataroot_lq=lq_root,
            io_backend=dict(type='disk'), cache_data=True,
            num_frame=cfg['num_frame'], padding='reflection_circle')},
        'network_g': dict(cfg),
        'path': dict(pretrain_network_g=ckpt, strict_load_g=True),
        'val': dict(save_img=False, metrics=dict(
            psnr=dict(type='calculate_psnr', crop_border=0,
                      test_y_channel=False))),
    }
    yml = osp.join(workdir, 'test_modelzoo.yml')
    with open(yml, 'w') as f:
        yaml.safe_dump(opt, f, sort_keys=False)
    env = dict(os.environ, EDVR_TPU_PLATFORM=os.environ.get(
        'EDVR_TPU_PLATFORM', 'cpu'))
    # append, never clobber: the env's PYTHONPATH carries the TPU plugin
    env['PYTHONPATH'] = REPO + (
        ':' + env['PYTHONPATH'] if env.get('PYTHONPATH') else '')
    subprocess.run([sys.executable, '-m', 'edvr_tpu.test', '-opt', yml],
                   check=True, cwd=workdir, env=env)
    return osp.join(workdir, 'results', opt['name'])


def modelzoo_table(results_dir):
    """Print the per-clip + average PSNR the way ModelZoo.md tabulates."""
    log = None
    for fn in sorted(os.listdir(results_dir)):
        if fn.endswith('.log'):
            log = osp.join(results_dir, fn)
    rows, avg = [], None
    if log:
        with open(log) as f:
            for line in f:
                # '# psnr: <avg>\t # 000: <v>\t # 011: <v> ...'
                if '# psnr:' in line:
                    avg = float(line.split('# psnr:')[1].split()[0])
                    for part in line.split('\t'):
                        part = part.strip().lstrip('# ')
                        name, _, val = part.partition(':')
                        if name != 'psnr' and val.strip():
                            rows.append((name, float(val.split()[0])))
    print('\n| Model | REDS4 clip | PSNR (dB) |')
    print('|---|---|---|')
    for name, val in rows:
        print(f'| EDVR_M_x4_SR_REDS | {name} | {val:.4f} |')
    if avg is not None:
        print(f'| EDVR_M_x4_SR_REDS | **average** | **{avg:.4f}** |')
        print('\nReference ModelZoo.md:105 EDVR_M_x4_SR_REDS: 30.53 dB '
              '(gate: within 0.05 dB when run on real REDS4 with the '
              'official checkpoint)')
    return avg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pth', default=None,
                    help='real official EDVR_REDS_SR_M .pth (default: '
                    'synthesize from the golden fixture)')
    ap.add_argument('--dataroot', default=None,
                    help='real REDS4 root containing GT/ and LQ/ '
                    '(default: synthetic clips)')
    ap.add_argument('--workdir', default=None)
    args = ap.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix='modelzoo_')
    os.makedirs(workdir, exist_ok=True)
    print(f'[workdir] {workdir}')

    fx = np.load(FIXTURE)
    cfg = json.loads(bytes(fx['__config__']).decode())

    if args.pth:
        pth, inp, want = args.pth, None, None
    else:
        pth = osp.join(workdir, 'EDVR_REDS_SR_M_synth.pth')
        cfg, inp, want = synthesize_official_pth(pth)
        print(f'[synth] official-format checkpoint written: {pth}')

    ckpt = osp.join(workdir, 'net_g_converted.ckpt')
    convert(pth, cfg, ckpt)

    if inp is not None:
        golden_forward_check(ckpt, cfg, inp, want)

    if args.dataroot:
        gt_root = osp.join(args.dataroot, 'GT')
        lq_root = osp.join(args.dataroot, 'LQ')
    else:
        droot = osp.join(workdir, 'reds4_synth')
        make_synthetic_reds4(droot)
        gt_root, lq_root = osp.join(droot, 'GT'), osp.join(droot, 'LQ')
        print('[data] synthetic REDS4-protocol clips (PSNR values are '
              'not comparable to ModelZoo — chain rehearsal only)')

    results = run_reds4_test_cli(ckpt, cfg, gt_root, lq_root, workdir)
    avg = modelzoo_table(results)
    real = bool(args.pth and args.dataroot)
    print(f'\n[done] chain={"REAL GATE" if real else "rehearsal"} '
          f'avg_psnr={avg}')


if __name__ == '__main__':
    main()
