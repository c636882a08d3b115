"""LPIPS over restored/GT folders
(reference: scripts/metrics/calculate_lpips.py — LPIPS is an external
dependency there too; gated the same way here)."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def main():
    try:
        import lpips  # noqa: F401
        import torch
    except ImportError:
        raise ImportError(
            'calculate_lpips requires the external `lpips` package '
            '(pip install lpips), matching the reference script.')
    import cv2
    import numpy as np

    from edvr_tpu.utils import scandir

    parser = argparse.ArgumentParser()
    parser.add_argument('--gt', required=True)
    parser.add_argument('--restored', required=True)
    parser.add_argument('--suffix', default='')
    args = parser.parse_args()

    loss_fn_vgg = lpips.LPIPS(net='vgg')
    mean = np.array([0.5, 0.5, 0.5], np.float32)
    std = np.array([0.5, 0.5, 0.5], np.float32)
    vals = []
    for i, img_path in enumerate(
            sorted(scandir(args.gt, recursive=True, full_path=True))):
        basename, ext = osp.splitext(osp.basename(img_path))
        img_gt = cv2.imread(img_path).astype(np.float32) / 255.
        img_r = cv2.imread(
            osp.join(args.restored,
                     basename + args.suffix + ext)).astype(np.float32) / 255.
        def to_t(img):
            img = (img[..., ::-1] - mean) / std
            return torch.from_numpy(img.transpose(2, 0, 1).copy())[None]
        v = loss_fn_vgg(to_t(img_gt), to_t(img_r)).item()
        vals.append(v)
        print(f'{i+1:3d}: {basename:25}. \tLPIPS: {v:.6f}')
    print(f'Average LPIPS: {sum(vals)/len(vals):.6f}')


if __name__ == '__main__':
    main()
