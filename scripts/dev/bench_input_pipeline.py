"""Host input-pipeline throughput benchmark (dev tool).

Measures batches/sec of the threaded DataLoader producing REDS-style
EDVR training batches (B x 5-frame LQ crops + GT crop, PNG decode +
random crop + augment) from synthetic on-disk clips, against the
measured TPU train-step time. The reference solves the same problem
with lmdb + process workers + a CUDA-stream prefetcher
(reference: basicsr/data/prefetch_dataloader.py:84-126).

Usage: python scripts/dev/bench_input_pipeline.py [batch] [gt_size]
       [workers ...]
"""

import os
import os.path as osp
import shutil
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import cv2
import numpy as np

# host-only benchmark: the dataset logger touches jax.process_index(),
# which must not drag in the (possibly busy) TPU backend
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

ROOT = '/tmp/bench_pipeline_reds'
TRAIN_STEP_MS = 128.0  # measured EDVR-M B4/64px band-kernel step (v5e)


def make_data(n_clips=1, frames=100, lq_hw=(180, 320), scale=4):
    marker = f'{ROOT}/train_sharp/{n_clips - 1:03d}/{frames - 1:08d}.png'
    if osp.exists(marker):
        return  # reuse synthetic data across runs
    if osp.exists(ROOT):
        shutil.rmtree(ROOT)
    rng = np.random.RandomState(0)
    meta = []
    for c in range(n_clips):
        clip = f'{c:03d}'
        os.makedirs(f'{ROOT}/train_sharp/{clip}')
        os.makedirs(f'{ROOT}/train_sharp_bicubic/{clip}')
        gt_hw = (lq_hw[0] * scale, lq_hw[1] * scale)
        for i in range(frames):
            gt = rng.randint(0, 256, (*gt_hw, 3), np.uint8)
            lq = cv2.resize(gt, lq_hw[::-1], interpolation=cv2.INTER_AREA)
            cv2.imwrite(f'{ROOT}/train_sharp/{clip}/{i:08d}.png', gt,
                        [cv2.IMWRITE_PNG_COMPRESSION, 1])
            cv2.imwrite(
                f'{ROOT}/train_sharp_bicubic/{clip}/{i:08d}.png', lq,
                [cv2.IMWRITE_PNG_COMPRESSION, 1])
        meta.append(f'{clip} {frames} ({gt_hw[0]},{gt_hw[1]},3)\n')
    with open(f'{ROOT}/meta.txt', 'w') as f:
        f.writelines(meta)


def make_paks():
    for sub in ('train_sharp', 'train_sharp_bicubic'):
        if osp.exists(f'{ROOT}/{sub}.tpak'):
            continue
        import subprocess
        subprocess.run([
            sys.executable, 'scripts/data_preparation/create_tpak.py',
            '--input', f'{ROOT}/{sub}', '--output', f'{ROOT}/{sub}.tpak'
        ], check=True, cwd=osp.join(osp.dirname(osp.abspath(__file__)),
                                    '..', '..'))


def make_dataset(gt_size, packed):
    # 'official' excludes clips 240-269 only, so the synthetic clip
    # '000' stays in the train split (REDS4 would exclude it)
    common = {
        'val_partition': 'official',
        'num_frame': 5, 'scale': 4, 'gt_size': gt_size,
        'interval_list': [1], 'random_reverse': False,
        'use_flip': True, 'use_rot': True,
    }
    if packed:
        from edvr_tpu.data.reds_packed_dataset import REDSPackedDataset
        return REDSPackedDataset({
            'dataroot_gt': f'{ROOT}/train_sharp.tpak',
            'dataroot_lq': f'{ROOT}/train_sharp_bicubic.tpak',
            'num_worker_per_gpu': 4, **common,
        })
    from edvr_tpu.data.reds_dataset import REDSDataset
    return REDSDataset({
        'dataroot_gt': f'{ROOT}/train_sharp',
        'dataroot_lq': f'{ROOT}/train_sharp_bicubic',
        'dataroot_flow': None,
        'meta_info_file': f'{ROOT}/meta.txt',
        'io_backend': {'type': 'disk'}, **common,
    })


def bench(batch, gt_size, workers, n_batches=20, packed=False):
    from edvr_tpu.data.loader import DataLoader

    ds = make_dataset(gt_size, packed)
    loader = DataLoader(ds, batch_size=batch, shuffle=True,
                        num_workers=workers, seed=0)
    it = iter(loader)
    # warm the decode caches / thread pool
    for _ in range(4):
        next(it)
    t0 = time.time()
    for _ in range(n_batches):
        b = next(it)
    dt = time.time() - t0
    ms = dt / n_batches * 1e3
    assert b['lq'].shape == (batch, 5, gt_size // 4, gt_size // 4, 3), \
        b['lq'].shape
    tag = 'tpak' if packed else 'png '
    print(f'{tag} workers={workers:2d}: {ms:7.1f} ms/batch '
          f'({1e3 / ms:5.2f} batches/s) — '
          f'{"KEEPS UP" if ms < TRAIN_STEP_MS else "BOTTLENECK"} vs '
          f'{TRAIN_STEP_MS:.0f} ms/step')
    return ms


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    gt_size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    workers = [int(a) for a in sys.argv[3:]] or [0, 2, 4, 8, 16]
    print(f'B{batch} x 5 frames, GT {gt_size}px (LQ {gt_size // 4}px) '
          f'REDS-style crops, PNG level-1, full-size 720x1280 GT frames, '
          f'{os.cpu_count()} host cpus')
    make_data()
    for w in workers:
        bench(batch, gt_size, w)
    from edvr_tpu.native import available
    if available():
        make_paks()
        for w in workers:
            bench(batch, gt_size, w, packed=True)
    else:
        print('native tpak reader unavailable (no compiler?) — skipped')


if __name__ == '__main__':
    main()
