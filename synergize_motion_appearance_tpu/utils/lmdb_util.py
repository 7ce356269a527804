"""LMDB dataset tooling (parity target: utils/lmdb_util.py:9-196).

Builds an LMDB of encoded images from folders; requires the optional
`lmdb` package (absent in hermetic images — the native frame cache in
data/native_loader.py is the preferred TPU path).
"""
from __future__ import annotations

import os
import sys
from multiprocessing import Pool
from os import path as osp
from typing import List, Optional, Tuple


def make_lmdb_from_imgs(data_path: str, lmdb_path: str,
                        img_path_list: List[str], keys: List[str],
                        batch: int = 5000, compress_level: int = 1,
                        map_size: Optional[int] = None):
    """Create an LMDB whose entries are cv2-encoded PNG bytes; writes the
    companion meta_info.txt exactly like the reference."""
    import cv2
    import lmdb

    assert len(img_path_list) == len(keys)
    if not lmdb_path.endswith(".lmdb"):
        raise ValueError("lmdb_path must end with '.lmdb'")
    if osp.exists(lmdb_path):
        raise FileExistsError(f"{lmdb_path} already exists")

    if map_size is None:
        img = cv2.imread(osp.join(data_path, img_path_list[0]),
                         cv2.IMREAD_UNCHANGED)
        _, img_byte = cv2.imencode(
            ".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level]
        )
        map_size = len(img_byte) * len(img_path_list) * 10

    env = lmdb.open(lmdb_path, map_size=map_size)
    txn = env.begin(write=True)
    txt_file = open(osp.join(lmdb_path, "meta_info.txt"), "w")
    for idx, (path, key) in enumerate(zip(img_path_list, keys)):
        img = cv2.imread(osp.join(data_path, path), cv2.IMREAD_UNCHANGED)
        h, w = img.shape[:2]
        c = img.shape[2] if img.ndim == 3 else 1
        _, img_byte = cv2.imencode(
            ".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level]
        )
        txn.put(key.encode("ascii"), img_byte.tobytes())
        txt_file.write(f"{key}.png ({h},{w},{c}) {compress_level}\n")
        if idx % batch == 0:
            txn.commit()
            txn = env.begin(write=True)
    txn.commit()
    env.close()
    txt_file.close()


class LmdbMaker:
    """Incremental LMDB writer (lmdb_util.py:156-196)."""

    def __init__(self, lmdb_path: str, map_size: int = 1024 ** 4,
                 batch: int = 5000, compress_level: int = 1):
        import lmdb

        if not lmdb_path.endswith(".lmdb"):
            raise ValueError("lmdb_path must end with '.lmdb'")
        if osp.exists(lmdb_path):
            raise FileExistsError(f"{lmdb_path} already exists")
        self.env = lmdb.open(lmdb_path, map_size=map_size)
        self.txn = self.env.begin(write=True)
        self.txt_file = open(osp.join(lmdb_path, "meta_info.txt"), "w")
        self.batch = batch
        self.compress_level = compress_level
        self.counter = 0

    def put(self, img_byte: bytes, key: str, img_shape: Tuple[int, ...]):
        self.counter += 1
        self.txn.put(key.encode("ascii"), img_byte)
        h, w, c = img_shape
        self.txt_file.write(
            f"{key}.png ({h},{w},{c}) {self.compress_level}\n"
        )
        if self.counter % self.batch == 0:
            self.txn.commit()
            self.txn = self.env.begin(write=True)

    def close(self):
        self.txn.commit()
        self.env.close()
        self.txt_file.close()
