"""Download reference pretrained models from Google Drive for
conversion (reference: scripts/download_pretrained_models.py). Requires
network access + the requests package; in air-gapped environments copy
the .pth files manually and run scripts/model_conversion/."""

import argparse
import os

from edvr_tpu.utils.download_util import download_file_from_google_drive

# file ids from the reference ModelZoo (docs/ModelZoo.md)
MODELS = {
    'EDVR_REDS_SR_M': '1jY_xUpw2f5cmbHaYbyBAptLLsBAPTsWB',
    'EDVR_REDS_SR_L': '1GZz_87HPPLGMT46JHfDDscrCCUEkW42M',
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('names', nargs='*', default=list(MODELS))
    parser.add_argument('--out_dir',
                        default='experiments/pretrained_models')
    args = parser.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.names:
        path = os.path.join(args.out_dir, f'{name}.pth')
        print(f'downloading {name} -> {path}')
        download_file_from_google_drive(MODELS[name], path)


if __name__ == '__main__':
    main()
