"""Google-Drive / URL download helpers
(reference: basicsr/utils/download_util.py). Gated on requests and
network availability."""

from __future__ import annotations

import math


def download_file_from_google_drive(file_id: str, save_path: str) -> None:
    """(reference: download_util.py:8-38)"""
    try:
        import requests
    except ImportError as e:
        raise ImportError('download requires the requests package.') from e

    session = requests.Session()
    url = 'https://docs.google.com/uc?export=download'
    params = {'id': file_id}
    response = session.get(url, params=params, stream=True)
    token = get_confirm_token(response)
    if token:
        params['confirm'] = token
        response = session.get(url, params=params, stream=True)

    # get file size
    response_file_size = session.get(url, params=params, stream=True,
                                     headers={'Range': 'bytes=0-2'})
    if 'Content-Range' in response_file_size.headers:
        file_size = int(
            response_file_size.headers['Content-Range'].split('/')[1])
    else:
        file_size = None
    save_response_content(response, save_path, file_size)


def get_confirm_token(response):
    for key, value in response.cookies.items():
        if key.startswith('download_warning'):
            return value
    return None


def save_response_content(response, destination, file_size=None,
                          chunk_size=32768):
    with open(destination, 'wb') as f:
        downloaded_size = 0
        for chunk in response.iter_content(chunk_size):
            downloaded_size += chunk_size
            if file_size is not None:
                pct = math.floor(downloaded_size / file_size * 100)
                print(f'\rDownload {pct}%', end='')
            if chunk:
                f.write(chunk)
        print('\nDownload finished.')
