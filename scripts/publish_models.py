"""Stamp checkpoints with a short content hash in the filename
(reference: scripts/publish_models.py)."""

import argparse
import glob
import hashlib


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('pattern', nargs='?', default='experiments/'
                        'pretrained_models/*.ckpt')
    args = parser.parse_args()
    for path in glob.glob(args.pattern):
        with open(path, 'rb') as f:
            sha = hashlib.sha256(f.read()).hexdigest()[:8]
        stem, ext = path.rsplit('.', 1)
        new_path = f'{stem}-{sha}.{ext}'
        import os
        os.rename(path, new_path)
        print(f'{path} -> {new_path}')


if __name__ == '__main__':
    main()
