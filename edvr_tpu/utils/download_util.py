"""Google-Drive / URL download helpers
(reference: basicsr/utils/download_util.py). Gated on requests and
network availability."""

from __future__ import annotations

_GDRIVE_URL = 'https://docs.google.com/uc?export=download'
_CHUNK = 32768


def download_file_from_google_drive(file_id: str, save_path: str) -> None:
    """Fetch a public Drive file, following the large-file confirm
    cookie when Drive inserts one (reference: download_util.py:8-38)."""
    try:
        import requests
    except ImportError as e:
        raise ImportError('download requires the requests package.') from e

    session = requests.Session()
    params = {'id': file_id}
    response = session.get(_GDRIVE_URL, params=params, stream=True)
    token = get_confirm_token(response)
    if token:
        params['confirm'] = token
        response = session.get(_GDRIVE_URL, params=params, stream=True)

    # total size via a ranged probe (the download stream itself carries
    # no Content-Length for Drive exports)
    probe = session.get(_GDRIVE_URL, params=params, stream=True,
                        headers={'Range': 'bytes=0-2'})
    content_range = probe.headers.get('Content-Range')
    total = int(content_range.split('/')[1]) if content_range else None
    save_response_content(response, save_path, total)


def get_confirm_token(response):
    """Drive's 'this file is too large to scan' confirmation cookie."""
    for key, value in response.cookies.items():
        if key.startswith('download_warning'):
            return value
    return None


def save_response_content(response, destination, file_size=None,
                          chunk_size=_CHUNK):
    done = 0
    with open(destination, 'wb') as f:
        for chunk in response.iter_content(chunk_size):
            done += chunk_size
            if file_size is not None:
                print(f'\rDownload {int(done / file_size * 100)}%',
                      end='')
            if chunk:
                f.write(chunk)
        print('\nDownload finished.')
