"""ESRGAN/RRDBNet single-image inference
(reference: inference/inference_esrgan.py:11-52): bare arch +
checkpoint, no config/engine involvement.

Usage:
    python inference/inference_esrgan.py --model_path <ckpt or .pth>
        --input datasets/Set14/LRbicx4 --output results/ESRGAN
"""

import argparse
import glob
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))


def main():
    import jax

    from edvr_tpu.archs.rrdbnet_arch import RRDBNet
    from edvr_tpu.models.base_model import BaseModel

    parser = argparse.ArgumentParser()
    parser.add_argument(
        '--model_path', type=str,
        default='experiments/pretrained_models/ESRGAN_SRx4.pth')
    parser.add_argument('--input', type=str, default='datasets/Set14/LRbicx4',
                        help='input test image folder')
    parser.add_argument('--output', type=str, default='results/ESRGAN',
                        help='output folder')
    args = parser.parse_args()

    net = RRDBNet(num_in_ch=3, num_out_ch=3, num_feat=64, num_block=23,
                  num_grow_ch=32)
    import jax.numpy as jnp
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 16, 16, 3)))
    loader = BaseModel({'is_train': False, 'num_gpu': 1, 'path': {}})
    params = loader.load_network(args.model_path, strict=True,
                                 params_template=variables['params'])
    fwd = jax.jit(lambda p, x: net.apply({'params': p}, x))

    os.makedirs(args.output, exist_ok=True)
    for idx, path in enumerate(
            sorted(glob.glob(osp.join(args.input, '*')))):
        imgname = osp.splitext(osp.basename(path))[0]
        print('Testing', idx, imgname)
        img = cv2.imread(path, cv2.IMREAD_COLOR).astype(np.float32) / 255.
        img = img[:, :, [2, 1, 0]]  # BGR -> RGB
        out = np.asarray(fwd(params, jnp.asarray(img[None])))[0]
        out = out[:, :, [2, 1, 0]]  # RGB -> BGR
        out = (np.clip(out, 0, 1) * 255.0).round().astype(np.uint8)
        cv2.imwrite(osp.join(args.output, f'{imgname}_ESRGAN.png'), out)


if __name__ == '__main__':
    main()
