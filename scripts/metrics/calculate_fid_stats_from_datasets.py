"""Extract Inception feature statistics (mean/cov) from a dataset for
FID (reference: scripts/metrics/calculate_fid_stats_from_datasets.py).

Writes inception_<name>_<size>.npz with {name, size, mean, cov}, the
format consumed by scripts/metrics/calculate_fid_folder.py and
calculate_stylegan2_fid.py.
"""

import argparse
import math
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from edvr_tpu.data import create_dataset  # noqa: E402
from edvr_tpu.data.loader import DataLoader  # noqa: E402
from edvr_tpu.metrics.fid import (extract_inception_features,  # noqa: E402
                                  load_patched_inception_v3)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--num_sample', type=int, default=50000)
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--size', type=int, default=512)
    parser.add_argument('--dataroot', type=str, default='datasets/ffhq')
    parser.add_argument('--inception_weights', type=str, default=None,
                        help='pt_inception-2015-12-05 weights (.pth)')
    args = parser.parse_args()

    inception_fn, _ = load_patched_inception_v3(args.inception_weights)

    # FFHQ protocol: no flip, normalized to [-1, 1]
    opt = dict(
        name='FFHQ', type='FFHQDataset',
        dataroot_gt=osp.join(args.dataroot, f'ffhq_{args.size}.lmdb'),
        io_backend=dict(type='lmdb'), use_hflip=False,
        mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5], phase='test')
    dataset = create_dataset(opt)
    loader = DataLoader(dataset, batch_size=args.batch_size, num_workers=4)
    total_batch = math.ceil(args.num_sample / args.batch_size)

    def gen():
        for idx, data in enumerate(loader):
            if idx >= total_batch:
                return
            yield data['gt']

    features = extract_inception_features(gen(), inception_fn, total_batch)
    total_len = features.shape[0]
    features = features[:args.num_sample]
    print(f'Extracted {total_len} features, '
          f'use the first {features.shape[0]} features to calculate stats.')
    mean = np.mean(features, 0)
    cov = np.cov(features, rowvar=False)

    save_path = f'inception_{opt["name"]}_{args.size}.npz'
    np.savez(save_path, name=opt['name'], size=args.size, mean=mean,
             cov=cov)
    print(f'Saved {save_path}')


if __name__ == '__main__':
    main()
