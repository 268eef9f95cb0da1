"""Remote asset resolver with a local cache.

Reference analogue: HttpResolver (reference: the curl-based remote-asset
fetch path in the import stack). `resolve(url)` returns a local file path:
remote URLs download once into the cache directory (keyed by URL hash),
local paths pass through. Zero-egress environments simply never hit the
network branch; the cache can be pre-seeded.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import urllib.request

CACHE_DIR = os.path.expanduser("~/.cache/basicrenderer_tpu/assets")


def resolve(uri: str, timeout: float = 30.0) -> str:
    """URL or path -> local file path (downloads + caches URLs)."""
    if not (uri.startswith("http://") or uri.startswith("https://")):
        return uri
    os.makedirs(CACHE_DIR, exist_ok=True)
    name = hashlib.sha1(uri.encode()).hexdigest()[:20]
    ext = os.path.splitext(uri.split("?")[0])[1][:8]
    path = os.path.join(CACHE_DIR, name + ext)
    if os.path.exists(path):
        return path
    tmp = path + ".part"
    with urllib.request.urlopen(uri, timeout=timeout) as r, \
            open(tmp, "wb") as f:
        shutil.copyfileobj(r, f)
    os.replace(tmp, path)
    return path
