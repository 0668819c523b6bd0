"""Checkpoint download helpers (urllib-based, no `wget` dependency).

Counterpart of the reference's download paths (utils/generation.py:53-65,
utils/download.py:5-45). This deployment image has no network egress, so
failures produce actionable instructions instead of retries.
"""

from __future__ import annotations

import logging
import os
import urllib.request

logger = logging.getLogger(__name__)

CHECKPOINT_URL = (
    "https://huggingface.co/Plachta/VALL-E-X/resolve/main/"
    "vallex-checkpoint.pt"
)


def download_file(url: str, out_path: str, chunk: int = 1 << 20) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tmp = out_path + ".part"
    try:
        with urllib.request.urlopen(url) as resp, open(tmp, "wb") as f:
            while True:
                data = resp.read(chunk)
                if not data:
                    break
                f.write(data)
        os.replace(tmp, out_path)
    except Exception as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise RuntimeError(
            f"Download failed ({e}). Manually download {url} and place it "
            f"at {out_path}."
        ) from e
    return out_path


def download_checkpoint(checkpoints_dir: str = "./checkpoints") -> str:
    out = os.path.join(checkpoints_dir, "vallex-checkpoint.pt")
    if os.path.exists(out):
        return out
    logger.info("Downloading model from %s ...", CHECKPOINT_URL)
    return download_file(CHECKPOINT_URL, out)


def download_file_from_google_drive(
    file_id: str, dest_dir: str, filename: str, chunk: int = 32768
) -> str:
    """Google Drive fetch with the confirm-token dance
    (reference: utils/download.py:5-45): files large enough to trigger
    the virus-scan interstitial return an HTML confirmation page on the
    first GET carrying a `download_warning` cookie; re-request with
    confirm=<token> to get the real bytes (stdlib urllib, no requests)."""
    import http.cookiejar
    import urllib.parse
    import urllib.request

    base = "https://docs.google.com/uc?export=download&confirm=1"
    qid = urllib.parse.quote(file_id)
    jar = http.cookiejar.CookieJar()
    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(jar)
    )
    out = os.path.join(dest_dir, filename)
    os.makedirs(dest_dir, exist_ok=True)
    tmp = out + ".part"
    try:
        with opener.open(f"{base}&id={qid}") as resp:
            token = next(
                (c.value for c in jar
                 if c.name.startswith("download_warning")), None,
            )
            if token is None:
                _stream_to(resp, tmp, chunk)
            else:
                resp.read()  # drain the interstitial
                with opener.open(
                    f"{base}&id={qid}&confirm={urllib.parse.quote(token)}"
                ) as resp2:
                    _stream_to(resp2, tmp, chunk)
        os.replace(tmp, out)
    except Exception as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise RuntimeError(
            f"Google Drive download failed ({e}). Manually download file"
            f" id {file_id} and place it at {out}."
        ) from e
    return out


def _stream_to(resp, path: str, chunk: int) -> None:
    with open(path, "wb") as f:
        while True:
            buf = resp.read(chunk)
            if not buf:
                break
            f.write(buf)
