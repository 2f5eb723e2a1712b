"""Cached HTTP downloads.

Parity: /root/reference/experiments/m71/survey_utils/download_utils.py:7-19
(download once, optionally decompress, write to destination), implemented
with ``requests`` instead of astropy's cache. All network access funnels
through ``download_file_to_dst`` so offline environments fail with one
clear error (and tests can stub it).
"""

from __future__ import annotations

from pathlib import Path

__all__ = ["download_file_to_dst", "DownloadError"]


class DownloadError(RuntimeError):
    pass


def download_file_to_dst(url, dst_filename, preprocess_fn=lambda x: x,
                         timeout: float = 120.0):
    """Download ``url`` to ``dst_filename`` unless it already exists,
    passing the payload through ``preprocess_fn`` (e.g. bz2.decompress)."""
    dst_path = Path(dst_filename)
    if dst_path.exists():
        return
    try:
        import requests

        resp = requests.get(url, timeout=timeout)
        resp.raise_for_status()
        payload = resp.content
    except Exception as e:  # pragma: no cover - network-dependent
        raise DownloadError(
            f"failed to download {url}: {e}. If this environment has no "
            "network access, place the file at "
            f"{dst_filename} manually."
        ) from e
    dst_path.parent.mkdir(parents=True, exist_ok=True)
    dst_path.write_bytes(preprocess_fn(payload))
