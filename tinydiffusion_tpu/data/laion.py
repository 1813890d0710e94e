"""LAION image+text pipeline — parity with the reference's hardened loader
(/root/reference/vae_laion.py:234-330, conditional_diffusion_laion.py:58-204).

Preserved behavioral contracts:
- md5-named JPEG cache (quality 95), corrupted-cache delete+refetch;
- failed-URL set persisted to a JSON file and reloaded across instances;
- two failure modes: ``on_error='zero'`` returns a zero image
  (vae_laion.py:296-304) while ``on_error='raise'`` raises ValueError
  (conditional_diffusion_laion.py:86-142);
- black-image detection treated as failure
  (conditional_diffusion_laion.py:104-137);
- requests Session with Retry(total=1, backoff_factor=1,
  status_forcelist=[429, 500, 502, 503, 504]) and timeout=5;
- ThreadPool pre-cache that returns valid indices and checks disk space at
  ~250 KB/sample (conditional_diffusion_laion.py:151-204).

Zero-egress environment: ``load_laion_dataset(offline=True)`` (the default
everywhere) yields deterministic synthetic records whose caption <-> image
correlation is real — each record is "a photo of a {cat,dog,horse,cow}" and
the rendered image's shape/palette depends on that class — so the
text-conditional stack trains with measurable per-prompt differentiation.
Images are served through the same URL-fetch/cache machinery via a
``synthetic://{i}`` scheme, keeping every hardening path exercised.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import shutil
from concurrent.futures import ThreadPoolExecutor, as_completed
from io import BytesIO
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

_CLASSES = ("cat", "dog", "horse", "cow")
_PER_SAMPLE_BYTES = 250 * 1024  # conditional_diffusion_laion.py:169


def synthesize_caption(i: int) -> str:
    """Deterministic caption; format matches the experiment's fixed sampling
    prompts so they are in-distribution."""
    return f"a photo of a {_CLASSES[i % len(_CLASSES)]}"


def synthesize_image(i: int, size: int) -> Tuple[np.ndarray, str]:
    """Deterministic (size, size, 3) uint8 image + its caption.

    Class-dependent palette and shape (circle / square / diamond / stripes)
    over a dark-to-mid gradient background with per-record jitter: enough
    structure for a VAE to reconstruct and for a text-conditional model to
    separate the four prompts.
    """
    cls = i % len(_CLASSES)
    rng = np.random.default_rng([9176, int(i)])
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / max(size - 1, 1)

    # Background: dark diagonal gradient (keeps genuinely dark pixels so
    # [-1, 1] normalization produces values near -1).
    base = 0.08 + 0.30 * (0.5 * (xx + yy))
    img = np.stack([base, base, base], axis=-1)

    palettes = np.array(
        [[0.85, 0.45, 0.20],   # cat: orange
         [0.30, 0.55, 0.90],   # dog: blue
         [0.45, 0.75, 0.30],   # horse: green
         [0.85, 0.80, 0.30]],  # cow: yellow
        np.float32,
    )
    color = palettes[cls] * rng.uniform(0.85, 1.1)
    cy, cx = rng.uniform(0.35, 0.65, 2)
    r = rng.uniform(0.18, 0.30)
    dy, dx = yy - cy, xx - cx
    if cls == 0:
        mask = dy * dy + dx * dx < r * r
    elif cls == 1:
        mask = np.maximum(np.abs(dy), np.abs(dx)) < r
    elif cls == 2:
        mask = (np.abs(dy) + np.abs(dx)) < 1.3 * r
    else:
        mask = (np.abs(dy) < r) & (np.sin(xx * 28.0) > 0.0)
    img = np.where(mask[..., None], color, img)
    img = img + rng.normal(0.0, 0.015, img.shape).astype(np.float32)
    img = np.clip(img, 0.0, 1.0)
    return (img * 255).astype(np.uint8), synthesize_caption(i)


def load_laion_dataset(n_records: int, offline: bool = True) -> List[dict]:
    """Records with the reference's column names (URL / TEXT).

    offline=True (default: zero-egress image) synthesizes records served via
    the ``synthetic://`` scheme; offline=False attempts the reference's HF
    dataset (conditional_diffusion_laion.py:145-148) and needs network +
    the ``datasets`` package.
    """
    if offline:
        return [
            {"URL": f"synthetic://{i}", "TEXT": synthesize_caption(i)}
            for i in range(n_records)
        ]
    try:
        from datasets import load_dataset  # type: ignore
    except ImportError as e:  # pragma: no cover - online-only path
        raise RuntimeError(
            "online LAION loading needs the 'datasets' package; "
            "use offline=True in zero-egress environments"
        ) from e
    return list(
        load_dataset("laion/laion2B-en-aesthetic", split=f"train[:{n_records}]")
    )


def check_disk_space(path: str, required_bytes: int) -> None:
    """RuntimeError when ``path``'s filesystem has less free space
    (conditional_diffusion_laion.py:151-159)."""
    free = shutil.disk_usage(path).free
    if free < required_bytes:
        raise RuntimeError(
            f"Need at least {required_bytes / 1024**3:.2f} GB free disk "
            f"space, have {free / 1024**3:.2f} GB"
        )


class _FetchError(Exception):
    pass


class LAIONImageTextDataset:
    """(image, text) pairs with JPEG caching and failure hardening.

    ``normalize=False`` -> float32 [0, 1] (ToTensor); ``normalize=True`` ->
    [-1, 1] (the diffusion transform, conditional_diffusion_laion.py:390-397);
    ``as_uint8=True`` -> raw resized uint8 (batch-time normalization by the
    native loader). NHWC throughout.
    """

    def __init__(
        self,
        records: List[dict],
        cache_dir: str,
        failed_urls_cache: str,
        image_size: int = 256,
        normalize: bool = True,
        on_error: str = "zero",
        as_uint8: bool = False,
    ):
        assert on_error in ("zero", "raise")
        self.records = list(records)
        self.cache_dir = cache_dir
        self.failed_urls_cache = failed_urls_cache
        self.image_size = image_size
        self.normalize = normalize
        self.on_error = on_error
        self.as_uint8 = as_uint8
        os.makedirs(cache_dir, exist_ok=True)
        parent = os.path.dirname(failed_urls_cache)
        if parent:
            os.makedirs(parent, exist_ok=True)
        self.failed_urls = set()
        if os.path.exists(failed_urls_cache):
            try:
                with open(failed_urls_cache) as f:
                    self.failed_urls = set(json.load(f))
            except (json.JSONDecodeError, IOError) as e:
                print(f"Error loading failed URLs cache: {e}")
                self.failed_urls = set()
        # Per-thread sessions: requests.Session is not thread-safe and
        # precache_dataset fans __getitem__ out over a ThreadPoolExecutor(8)
        # (the reference sidesteps this with a fresh session per fetch,
        # vae_laion.py:284-293; a thread-local keeps its connection pooling).
        self._local = threading.local()

    def __len__(self) -> int:
        return len(self.records)

    def save_failed_urls(self) -> None:
        try:
            with open(self.failed_urls_cache, "w") as f:
                json.dump(sorted(self.failed_urls), f)
        except IOError as e:
            print(f"Error saving failed URLs cache: {e}")

    def _mark_failed(self, url: str) -> None:
        self.failed_urls.add(url)
        self.save_failed_urls()

    def _cache_path(self, url: str) -> str:
        url_hash = hashlib.md5(url.encode("utf-8")).hexdigest()
        return os.path.join(self.cache_dir, f"{url_hash}.jpg")

    def _fetch(self, url: str) -> Image.Image:
        """Fetch by URL: synthetic scheme renders locally, http(s) goes
        through the retry session (vae_laion.py:284-293)."""
        if url.startswith("synthetic://"):
            arr, _ = synthesize_image(int(url.split("://", 1)[1]), self.image_size)
            return Image.fromarray(arr)
        import requests
        from requests.adapters import HTTPAdapter
        from urllib3.util.retry import Retry

        session = getattr(self._local, "session", None)
        if session is None:
            session = requests.Session()
            retries = Retry(
                total=1, backoff_factor=1,
                status_forcelist=[429, 500, 502, 503, 504],
            )
            session.mount("http://", HTTPAdapter(max_retries=retries))
            session.mount("https://", HTTPAdapter(max_retries=retries))
            self._local.session = session
        response = session.get(url, timeout=5)
        response.raise_for_status()
        return Image.open(BytesIO(response.content)).convert("RGB")

    def _load_u8(self, idx: int) -> np.ndarray:
        """Resized uint8 (image_size, image_size, 3) or _FetchError."""
        url = self.records[idx]["URL"]
        if url in self.failed_urls:
            raise _FetchError("Failed URL (cached)")
        cache_path = self._cache_path(url)
        image = None
        if os.path.exists(cache_path):
            try:
                image = Image.open(cache_path).convert("RGB")
            except (OSError, Image.UnidentifiedImageError) as e:
                # Corrupted cache: delete and refetch (vae_laion.py:275-278).
                print(f"Corrupted cache file {cache_path}, refetching: {e}")
                os.remove(cache_path)
                image = None
        if image is None:
            try:
                image = self._fetch(url)
            except Exception as e:
                self._mark_failed(url)
                raise _FetchError(f"download failed: {e}") from e
            try:
                image.save(cache_path, "JPEG", quality=95)
            except OSError as e:
                print(f"Error caching {url}: {e}")
        if image.size != (self.image_size, self.image_size):
            image = image.resize((self.image_size, self.image_size), Image.BILINEAR)
        arr = np.asarray(image, dtype=np.uint8)
        if not arr.any():
            # Black image == failure (conditional_diffusion_laion.py:104-137).
            self._mark_failed(url)
            raise _FetchError("black image")
        return arr

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, str]:
        text = self.records[idx].get("TEXT", "")
        try:
            arr = self._load_u8(idx)
        except _FetchError as e:
            if self.on_error == "raise":
                raise ValueError(f"Failed to load sample {idx}: {e}") from e
            # Literal zeros, NOT normalized zeros — the reference returns
            # torch.zeros regardless of transform (vae_laion.py:296-304).
            dtype = np.uint8 if self.as_uint8 else np.float32
            return np.zeros((self.image_size, self.image_size, 3), dtype), text
        if self.as_uint8:
            return arr, text
        x = arr.astype(np.float32) / 255.0
        if self.normalize:
            x = x * 2.0 - 1.0
        return x, text


def precache_dataset(
    ds: LAIONImageTextDataset,
    max_samples: Optional[int] = None,
    max_workers: int = 8,
) -> List[int]:
    """ThreadPool warm-up of the JPEG cache; returns sorted valid indices
    (conditional_diffusion_laion.py:165-204). Invalid = fetch failure,
    black image, or empty caption."""
    n = min(max_samples or len(ds), len(ds))
    check_disk_space(ds.cache_dir, n * _PER_SAMPLE_BYTES)

    def cache_one(idx: int) -> Tuple[int, bool]:
        try:
            x, text = ds[idx]
            return idx, bool(text) and bool(np.any(x))
        except Exception:
            return idx, False

    valid: List[int] = []
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        futures = [ex.submit(cache_one, i) for i in range(n)]
        for fut in as_completed(futures):
            idx, ok = fut.result()
            if ok:
                valid.append(idx)
    return sorted(valid)
