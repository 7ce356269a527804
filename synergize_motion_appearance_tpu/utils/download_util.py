"""Model download helpers (parity target: utils/download_util.py:11-94).

Zero-egress environments can't download; these raise actionable errors
but keep the same API so configs referencing URLs degrade gracefully.
"""
from __future__ import annotations

import os
from typing import Optional


def download_file_from_google_drive(file_id: str, save_path: str):
    try:
        import requests  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "requests unavailable; place the checkpoint manually at "
            f"{save_path}"
        ) from e
    session = __import__("requests").Session()
    URL = "https://docs.google.com/uc?export=download"
    response = session.get(URL, params={"id": file_id}, stream=True)
    token = None
    for key, value in response.cookies.items():
        if key.startswith("download_warning"):
            token = value
    if token:
        response = session.get(
            URL, params={"id": file_id, "confirm": token}, stream=True
        )
    _save_response(response, save_path)


def load_file_from_url(url: str, model_dir: str,
                       file_name: Optional[str] = None) -> str:
    os.makedirs(model_dir, exist_ok=True)
    filename = file_name or os.path.basename(url.split("?")[0])
    cached = os.path.join(model_dir, filename)
    if os.path.exists(cached):
        return cached
    try:
        import urllib.request

        urllib.request.urlretrieve(url, cached)
    except Exception as e:
        raise RuntimeError(
            f"Could not download {url} (offline environment?). Place the "
            f"file manually at {cached}."
        ) from e
    return cached


def _save_response(response, destination, chunk_size: int = 32768):
    with open(destination, "wb") as f:
        for chunk in response.iter_content(chunk_size):
            if chunk:
                f.write(chunk)
