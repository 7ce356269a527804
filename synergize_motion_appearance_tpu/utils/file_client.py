"""Pluggable IO backends (parity target: utils/file_client.py:5-167).

disk always works; lmdb/memcached register lazily and raise clear errors
when their libraries are absent.
"""
from __future__ import annotations

from typing import Any, Dict, Optional


class BaseStorageBackend:
    def get(self, filepath: str) -> bytes:
        raise NotImplementedError

    def get_text(self, filepath: str) -> str:
        raise NotImplementedError


class HardDiskBackend(BaseStorageBackend):
    def get(self, filepath: str) -> bytes:
        with open(filepath, "rb") as f:
            return f.read()

    def get_text(self, filepath: str) -> str:
        with open(filepath, "r") as f:
            return f.read()


class LmdbBackend(BaseStorageBackend):
    """LMDB backend (file_client.py:74+). One env per db path."""

    def __init__(self, db_paths, client_keys="default", readonly=True,
                 lock=False, readahead=False, **kwargs):
        try:
            import lmdb
        except ImportError as e:
            raise ImportError(
                "lmdb is not installed; use io_backend type 'disk' or the "
                "native frame cache"
            ) from e
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, str):
            db_paths = [db_paths]
        assert len(client_keys) == len(db_paths)
        self._client = {
            k: lmdb.open(p, readonly=readonly, lock=lock,
                         readahead=readahead, **kwargs)
            for k, p in zip(client_keys, db_paths)
        }

    def get(self, filepath: str, client_key: str = "default") -> bytes:
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            return txn.get(str(filepath).encode("ascii"))


class MemcachedBackend(BaseStorageBackend):
    def __init__(self, server_list_cfg, client_cfg, sys_path=None):
        raise ImportError(
            "memcached backend requires pymemcache/mc which are not "
            "available; use 'disk'"
        )


class FileClient:
    _backends = {
        "disk": HardDiskBackend,
        "lmdb": LmdbBackend,
        "memcached": MemcachedBackend,
    }

    def __init__(self, backend: str = "disk", **kwargs):
        if backend not in self._backends:
            raise ValueError(
                f"Backend {backend} not supported. "
                f"Available: {list(self._backends)}"
            )
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath: str, client_key: str = "default") -> bytes:
        if self.backend == "lmdb":
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)

    def get_text(self, filepath: str) -> str:
        return self.client.get_text(filepath)
