"""LMDB dataset packaging.

Writes the toolbox's lmdb layout — PNG-encoded values keyed by
``<clip>/<frame>``-style names plus a ``meta_info.txt`` manifest of
``<key>.png (h,w,c) <compress_level>`` lines — so datasets built here
load in either framework (reference: basicsr/utils/lmdb_util.py).

Gated on the optional ``lmdb`` package (not part of this image's baked
dependencies); datasets can always be used from disk directly.
"""

from __future__ import annotations

from multiprocessing import Pool
from os import path as osp

import cv2


def _require_lmdb():
    try:
        import lmdb
    except ImportError as e:
        raise ImportError('this tool needs the optional lmdb package; '
                          'install lmdb or stay on the disk backend.') \
            from e
    return lmdb


def _encode_one(path, key, compress_level):
    """Read one image and PNG-encode it; returns (key, bytes, shape)
    (reference: lmdb_util.py:136-158)."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    shape = (img.shape[0], img.shape[1],
             1 if img.ndim == 2 else img.shape[2])
    ok, blob = cv2.imencode('.png', img,
                            [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
    assert ok, f'PNG encode failed for {path}'
    return key, blob, shape


# kept under the reference's public name for script compatibility
read_img_worker = _encode_one


def make_lmdb_from_imgs(data_path, lmdb_path, img_path_list, keys,
                        batch=5000, compress_level=1,
                        multiprocessing_read=False, n_thread=40,
                        map_size=None):
    """Pack a list of images into one .lmdb with its manifest
    (reference: lmdb_util.py:9-133).

    ``multiprocessing_read`` pre-decodes everything into RAM with
    ``n_thread`` workers (only sensible when the set fits in memory);
    ``map_size=None`` sizes the map at 10x a sample encoding.
    """
    _require_lmdb()
    if len(img_path_list) != len(keys):
        raise ValueError(f'{len(img_path_list)} paths vs {len(keys)} keys')

    print(f'Packing {len(img_path_list)} images from {data_path} '
          f'into {lmdb_path}...')

    encoded = {}
    if multiprocessing_read:
        print(f'Pre-reading with {n_thread} processes...')
        with Pool(n_thread) as pool:
            jobs = [
                pool.apply_async(_encode_one,
                                 (osp.join(data_path, p), k,
                                  compress_level))
                for p, k in zip(img_path_list, keys)
            ]
            for job in jobs:
                key, blob, shape = job.get()
                encoded[key] = (blob, shape)
        print(f'Pre-read {len(encoded)} images.')

    if map_size is None:
        _, blob, _ = _encode_one(osp.join(data_path, img_path_list[0]),
                                 keys[0], compress_level)
        map_size = blob.nbytes * len(img_path_list) * 10
        print(f'Sized lmdb map at {map_size} bytes '
              f'({blob.nbytes}/sample x10).')

    writer = LmdbMaker(lmdb_path, map_size=map_size, batch=batch,
                       compress_level=compress_level)
    for idx, (path, key) in enumerate(zip(img_path_list, keys)):
        if idx % 100 == 0:
            print(f'\rWriting image {idx}...', end='')
        if multiprocessing_read:
            blob, shape = encoded[key]
        else:
            _, blob, shape = _encode_one(osp.join(data_path, path), key,
                                         compress_level)
        writer.put(blob, key, shape)
    writer.close()
    print('\nDone.')


class LmdbMaker:
    """Incremental writer: ``put`` PNG bytes under a key, commit every
    ``batch`` puts, manifest kept in sync
    (reference: lmdb_util.py:161-208)."""

    def __init__(self, lmdb_path, map_size=1024**4, batch=5000,
                 compress_level=1):
        lmdb = _require_lmdb()
        if not lmdb_path.endswith('.lmdb'):
            raise ValueError(f"lmdb_path must end with '.lmdb', got "
                             f'{lmdb_path}')
        if osp.exists(lmdb_path):
            raise FileExistsError(
                f'{lmdb_path} already exists; refusing to overwrite.')

        self.lmdb_path = lmdb_path
        self.batch = batch
        self.compress_level = compress_level
        self.env = lmdb.open(lmdb_path, map_size=map_size)
        self.txn = self.env.begin(write=True)
        self.manifest = open(osp.join(lmdb_path, 'meta_info.txt'), 'w')
        self.n_written = 0

    def put(self, img_bytes, key, img_shape):
        self.n_written += 1
        self.txn.put(key.encode('ascii'), img_bytes)
        h, w, c = img_shape
        self.manifest.write(f'{key}.png ({h},{w},{c}) '
                            f'{self.compress_level}\n')
        if self.n_written % self.batch == 0:
            self.txn.commit()
            self.txn = self.env.begin(write=True)

    def close(self):
        self.txn.commit()
        self.env.close()
        self.manifest.close()
