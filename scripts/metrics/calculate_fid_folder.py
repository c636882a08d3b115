"""FID between a folder of images and saved dataset statistics
(reference: scripts/metrics/calculate_fid_folder.py)."""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from edvr_tpu.metrics.fid import (calculate_fid,  # noqa: E402
                                  extract_inception_features,
                                  load_patched_inception_v3)
from edvr_tpu.data import create_dataset  # noqa: E402
from edvr_tpu.data.loader import DataLoader  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('folder', type=str, help='Path to the folder.')
    parser.add_argument('--fid_stats', type=str, required=True,
                        help='Path to the dataset fid statistics (.npz with '
                        'mean/cov).')
    parser.add_argument('--inception_weights', type=str, default=None,
                        help='pt_inception-2015-12-05 weights (.pth)')
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--num_sample', type=int, default=50000)
    args = parser.parse_args()

    # inception model
    inception_fn, _ = load_patched_inception_v3(args.inception_weights)

    # create dataset: single-image folder, normalized to [-1, 1] like the
    # reference's FFHQ statistics protocol
    opt = dict(name='SingleImageDataset', type='SingleImageDataset',
               dataroot_lq=args.folder, io_backend=dict(type='disk'),
               mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5], phase='test')
    dataset = create_dataset(opt)
    loader = DataLoader(dataset, batch_size=args.batch_size,
                        num_workers=4)
    num_sample = min(args.num_sample, len(dataset))

    def gen():
        seen = 0
        for batch in loader:
            if seen >= num_sample:
                return
            seen += batch['lq'].shape[0]
            yield batch['lq']

    features = extract_inception_features(gen(), inception_fn)
    features = features[:num_sample]
    print(f'Extracted {features.shape[0]} features.')

    sample_mean = np.mean(features, 0)
    sample_cov = np.cov(features, rowvar=False)

    stats = np.load(args.fid_stats)
    real_mean = stats['mean']
    real_cov = stats['cov']

    fid = calculate_fid(sample_mean, sample_cov, real_mean, real_cov)
    print('fid:', fid)


if __name__ == '__main__':
    main()
