"""Download evaluation datasets from Google Drive and unzip them
(reference: scripts/data_preparation/download_datasets.py).

Usage: python scripts/data_preparation/download_datasets.py Set5
       python scripts/data_preparation/download_datasets.py all
"""

import argparse
import glob
import os
import shutil
import zipfile
from os import path as osp

import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from edvr_tpu.utils.download_util import \
    download_file_from_google_drive  # noqa: E402

# file name -> Google Drive file id, per dataset
FILE_IDS = {
    'Set5': {
        'Set5.zip': '1RtyIeUFTyW8u7oa4z7a0lSzT3T1FwZE9',
    },
    'Set14': {
        'Set14.zip': '1vsw07sV8wGrRQ8UARe2fO5jjgy9QJy_E',
    },
}


def download_dataset(dataset, file_ids, save_path_root='./datasets/'):
    os.makedirs(save_path_root, exist_ok=True)

    for file_name, file_id in file_ids.items():
        save_path = osp.abspath(osp.join(save_path_root, file_name))
        if osp.exists(save_path):
            response = input(
                f'{file_name} already exist. Do you want to cover it? Y/N\n')
            if response.lower() == 'y':
                print(f'Covering {file_name} to {save_path}')
                download_file_from_google_drive(file_id, save_path)
            elif response.lower() == 'n':
                print(f'Skipping {file_name}')
                continue
            else:
                raise ValueError('Wrong input. Only accepts Y/N.')
        else:
            print(f'Downloading {file_name} to {save_path}')
            download_file_from_google_drive(file_id, save_path)

        if save_path.endswith('.zip'):
            extracted_path = save_path.replace('.zip', '')
            print(f'Extract {save_path} to {extracted_path}')
            with zipfile.ZipFile(save_path, 'r') as zip_ref:
                zip_ref.extractall(extracted_path)

            # flatten a redundant single top-level folder
            subfolder = osp.join(extracted_path,
                                 file_name.replace('.zip', ''))
            if osp.isdir(subfolder):
                print(f'Move {subfolder} to {extracted_path}')
                for path in glob.glob(osp.join(subfolder, '*')):
                    shutil.move(path, extracted_path)
                shutil.rmtree(subfolder)


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument(
        'dataset', type=str,
        help=("Options: 'Set5', 'Set14'. "
              "Set to 'all' to download every dataset."))
    args = parser.parse_args()

    if args.dataset == 'all':
        for name, ids in FILE_IDS.items():
            download_dataset(name, ids)
    else:
        download_dataset(args.dataset, FILE_IDS[args.dataset])
