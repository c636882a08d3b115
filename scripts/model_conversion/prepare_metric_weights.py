"""One-command rehearsal for the real-weight metric paths.

Converts the torchvision VGG19 (perceptual loss,
reference: basicsr/models/archs/vgg_arch.py:59-171) and/or the FID
InceptionV3 (pt_inception-2015-12-05,
reference: basicsr/metrics/fid.py:10-27) torch checkpoints into this
framework's .ckpt format, probes each converted net on a fixed input,
and prints/validates activation fingerprints — so the first run with
the real downloaded weights is turnkey and self-checking.

Usage:
  python scripts/model_conversion/prepare_metric_weights.py \
      --vgg vgg19-dcbb9e9d.pth --inception pt_inception-2015-12-05.pth \
      --out experiments/pretrained_models [--expect fingerprints.json]

With --expect, each fingerprint is compared against the recorded JSON
(written by a previous run via --record); a mismatch exits nonzero.
"""

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import numpy as np


def _probe_image(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def _fingerprint(arr) -> dict:
    arr = np.asarray(arr, np.float64)
    return {
        'shape': list(arr.shape),
        'mean': round(float(arr.mean()), 6),
        'std': round(float(arr.std()), 6),
        'absmax': round(float(np.abs(arr).max()), 6),
    }


def convert_vgg(path: str, out_dir: str) -> dict:
    import jax

    from edvr_tpu.archs.vgg_arch import VGGFeatureExtractor, load_vgg_weights

    layers = ['conv1_2', 'conv2_2', 'conv3_4', 'conv4_4', 'conv5_4']
    net = VGGFeatureExtractor(layer_name_list=layers, vgg_type='vgg19',
                              use_input_norm=True)
    template = net.init(jax.random.PRNGKey(0),
                        np.zeros((1, 64, 64, 3), np.float32))
    params = load_vgg_weights(path, template)

    out = net.apply(params, _probe_image((1, 64, 64, 3)))
    prints = {f'vgg19/{k}': _fingerprint(v) for k, v in out.items()}

    dst = osp.join(out_dir, 'vgg19_features.ckpt')
    from edvr_tpu.models.base_model import dump_checkpoint
    dump_checkpoint({'params': jax.tree_util.tree_map(
        np.asarray, params['params'])}, dst)
    print(f'VGG19 converted -> {dst}')
    return prints


def convert_inception(path: str, out_dir: str) -> dict:
    import jax

    from edvr_tpu.metrics.fid import load_patched_inception_v3

    apply_fn, variables = load_patched_inception_v3(path)
    feats = apply_fn(_probe_image((2, 299, 299, 3)))
    prints = {'fid_inception/pool3': _fingerprint(feats)}

    dst = osp.join(out_dir, 'fid_inception.ckpt')
    from edvr_tpu.models.base_model import dump_checkpoint
    dump_checkpoint(jax.tree_util.tree_map(np.asarray, dict(variables)),
                    dst)
    print(f'FID InceptionV3 converted -> {dst}')
    return prints


def check_expected(prints: dict, expect_path: str) -> bool:
    with open(expect_path) as f:
        expected = json.load(f)
    ok = True
    for key, got in prints.items():
        want = expected.get(key)
        if want is None:
            print(f'[warn] no recorded fingerprint for {key}')
            continue
        for field in ('mean', 'std', 'absmax'):
            if abs(got[field] - want[field]) > 1e-4 * max(
                    1.0, abs(want[field])):
                print(f'[FAIL] {key}.{field}: got {got[field]}, '
                      f'recorded {want[field]}')
                ok = False
        if list(got['shape']) != list(want['shape']):
            print(f'[FAIL] {key}.shape: got {got["shape"]}, '
                  f'recorded {want["shape"]}')
            ok = False
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--vgg', help='torchvision vgg19 .pth')
    ap.add_argument('--inception', help='pt_inception-2015-12-05 .pth')
    ap.add_argument('--out', default='experiments/pretrained_models')
    ap.add_argument('--expect', help='fingerprint JSON to validate '
                                     'against')
    ap.add_argument('--record', help='write fingerprints to this JSON')
    args = ap.parse_args(argv)
    if not args.vgg and not args.inception:
        ap.error('nothing to do: pass --vgg and/or --inception')

    os.makedirs(args.out, exist_ok=True)
    prints = {}
    if args.vgg:
        prints.update(convert_vgg(args.vgg, args.out))
    if args.inception:
        prints.update(convert_inception(args.inception, args.out))

    print(json.dumps(prints, indent=2))
    if args.record:
        with open(args.record, 'w') as f:
            json.dump(prints, f, indent=2)
        print(f'fingerprints recorded -> {args.record}')
    if args.expect and not check_expected(prints, args.expect):
        raise SystemExit('fingerprint validation FAILED')
    if args.expect:
        print('fingerprint validation OK')


if __name__ == '__main__':
    main()
