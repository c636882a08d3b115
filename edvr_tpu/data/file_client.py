"""IO backends behind a uniform byte-oriented facade.

Equivalent of the reference FileClient
(reference: basicsr/utils/file_client.py:147-183): 'disk' reads files,
'lmdb' serves values from LMDB databases keyed per client
(file_client.py:76-144), 'memcached' is gated on its client library.
The lmdb backend degrades gracefully when the lmdb package is absent
(it is not part of this image's baked dependencies).
"""

from __future__ import annotations


class BaseStorageBackend:
    def get(self, filepath):  # pragma: no cover - interface
        raise NotImplementedError


class DiskBackend(BaseStorageBackend):
    def get(self, filepath) -> bytes:
        with open(str(filepath), 'rb') as f:
            return f.read()


class MemcachedBackend(BaseStorageBackend):  # pragma: no cover - optional
    def __init__(self, server_list_cfg, client_cfg, sys_path=None):
        if sys_path is not None:
            import sys
            sys.path.append(sys_path)
        try:
            import mc
        except ImportError:
            raise ImportError('Please install memcached to enable '
                              'MemcachedBackend.')
        self.server_list_cfg = server_list_cfg
        self.client_cfg = client_cfg
        self._client = mc.MemcachedClient.GetInstance(server_list_cfg,
                                                      client_cfg)
        self._mc_buffer = mc.pyvector()

    def get(self, filepath):
        import mc
        self._client.Get(str(filepath), self._mc_buffer)
        return mc.ConvertBuffer(self._mc_buffer)


class LmdbBackend(BaseStorageBackend):
    """Multi-database LMDB reader (reference: file_client.py:76-144).

    Args:
        db_paths: str or list of paths to .lmdb dirs.
        client_keys: str or list naming each database; dataset code
            requests bytes via ``get(key, client_key)``.
    """

    def __init__(self, db_paths, client_keys='default', readonly=True,
                 lock=False, readahead=False, **kwargs):
        try:
            import lmdb
        except ImportError as e:
            raise ImportError(
                'The lmdb backend needs the lmdb package, which is not '
                'installed in this environment. Use the disk backend or '
                'convert the dataset with scripts/data_preparation.'
            ) from e
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, list):
            self.db_paths = [str(v) for v in db_paths]
        else:
            self.db_paths = [str(db_paths)]
        assert len(client_keys) == len(self.db_paths)
        self._client = {}
        for client, path in zip(client_keys, self.db_paths):
            self._client[client] = lmdb.open(path, readonly=readonly,
                                             lock=lock, readahead=readahead,
                                             **kwargs)

    def get(self, filepath, client_key):
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            value_buf = txn.get(str(filepath).encode('ascii'))
        return value_buf


class FileClient:
    """Facade dispatching to a backend (reference: file_client.py:147-183)."""

    _backends = {
        'disk': DiskBackend,
        'memcached': MemcachedBackend,
        'lmdb': LmdbBackend,
    }

    def __init__(self, backend='disk', **kwargs):
        if backend not in self._backends:
            raise ValueError(f'Backend {backend} is not supported. '
                             f'Currently supported ones are '
                             f'{list(self._backends.keys())}')
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath, client_key='default'):
        if self.backend == 'lmdb':
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)
