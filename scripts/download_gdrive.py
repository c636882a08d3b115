"""Download a single file from Google Drive by file id.

Counterpart of the reference's ``scripts/download_gdrive.py`` (which
wraps ``basicsr.utils.download_util.download_file_from_google_drive``).
"""

import argparse

from edvr_tpu.utils.download_util import download_file_from_google_drive

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--id', type=str, required=True, help='File id')
    parser.add_argument('--output', type=str, required=True,
                        help='Save path')
    args = parser.parse_args()
    download_file_from_google_drive(args.id, args.output)
