"""Host-side data pipeline feeding HBM-resident, sharded batches.

The reference's pipeline is a single-process torch DataLoader (num_workers=0, no
prefetch, README.md:96-99) whose NIfTI decode runs inline with the train loop. Here
(BASELINE north star): decode runs in a host thread pool (the C++ batch decoder
releases the GIL), batches are assembled as NHWC float32, and ``device_prefetch``
keeps ``depth`` batches in flight to the device(s) with the caller's sharding —
H2D copy overlaps the previous step's compute, so the TPU never waits on the host.

``SyntheticDataset`` generates deterministic random "hand X-ray"-shaped data for
benchmarks and tests (no files needed); batches can also be produced directly on
device for pure step-time benchmarking.
"""

from __future__ import annotations

import ctypes
import os
import threading
import queue
from pathlib import Path
from typing import Iterator, List, Optional, Sequence

import jax
import numpy as np

from vaegan_tpu.config import DataConfig
from vaegan_tpu.data import nifti


class NiftiDataset:
    """Directory of .nii / .nii.gz files -> normalized, resized (H, W, 1) images
    (reference NiftyDataset, README.md:50-90, plus the documented-but-missing
    resize)."""

    def __init__(self, root_dir, image_size: int = 96, normalize: bool = True,
                 num_workers: int = 0):
        self.root_dir = Path(root_dir)
        self.image_size = image_size
        self.normalize = normalize
        self.num_workers = num_workers  # C++ decode threads; 0 = hw concurrency
        self.filenames = sorted(
            f for f in os.listdir(self.root_dir)
            if str(f).endswith((".nii", ".nii.gz")))
        if not self.filenames:
            raise FileNotFoundError(f"no NIfTI files under {self.root_dir}")

    def __len__(self) -> int:
        return len(self.filenames)

    def __getitem__(self, idx: int) -> np.ndarray:
        return nifti.load_image(self.root_dir / self.filenames[idx],
                                self.image_size, self.normalize)

    def load_batch(self, indices: Sequence[int]) -> np.ndarray:
        """Decode a batch; uses the C++ multi-threaded batch decoder when built."""
        lib = nifti._load_lib()
        if lib is not None and hasattr(lib, "nifti_decode_batch"):
            lib.nifti_decode_batch.restype = ctypes.c_int
            n = len(indices)
            out = np.empty((n, self.image_size, self.image_size), np.float32)
            paths = [str(self.root_dir / self.filenames[i]).encode() for i in indices]
            arr = (ctypes.c_char_p * n)(*paths)
            rc = lib.nifti_decode_batch(
                arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.image_size, self.image_size, int(self.normalize),
                int(getattr(self, "num_workers", 0)))
            if rc != 0:
                raise ValueError(f"batch decode failed: {lib.nifti_last_error().decode()}")
            return out[..., None]
        return np.stack([self[i] for i in indices])


class SyntheticDataset:
    """Deterministic synthetic images in [0, 1] shaped like the hand X-rays.

    Two styles:

    - ``"blobs"`` (default): smooth low-frequency random fields — cheap,
      deterministic, and trivially fittable by pixel losses. On this data the
      adversarial term has no pixel-MSE upside (BENCH_NOTES quality tables).
    - ``"edges"``: the same smooth fields quantized into discrete intensity
      levels, producing sharp iso-contour step edges whose *positions* are fully
      determined by the underlying smooth field. This emulates the property of
      the reference's hand X-rays that its adversarial term exploits
      (bone/tissue boundaries): an MSE-trained decoder's posterior-mean output
      smears the step edges, while the critic pushes reconstructions back onto
      the sharp-edged manifold — the regime where the reference observed
      VAE-GAN beating the plain VAE on pixel MSE (README.md:1266 vs 1319).
    - ``"texture"``: the quantized low-frequency field plus a quantized
      *resolution-proportional* field (base resolution ``image_size // 4``) —
      iso-contours every few pixels at ANY output resolution, so the
      edge-pixel fraction holds constant with image size instead of shrinking
      ~1/L as the fixed-base ``edges`` style's does. This is the property real
      X-rays keep at 256^2 (high-frequency trabecular/soft-tissue texture at
      every scale) that the 256^2 ``edges`` pairing in BENCH_NOTES lacked.
    """

    def __init__(self, size: int = 1200, image_size: int = 96, seed: int = 0,
                 style: str = "blobs"):
        if style not in ("blobs", "edges", "texture"):
            raise ValueError(
                f"synthetic style must be 'blobs'|'edges'|'texture', got {style!r}")
        self.size = size
        self.image_size = image_size
        self.style = style
        self._rng = np.random.default_rng(seed)
        # smooth blobby images: low-freq random fields, minmax-normalized
        base = self._rng.normal(size=(size, 12, 12)).astype(np.float32)
        self._low = base
        if style == "texture":
            # fine field whose base scales with the output resolution: upsampled
            # exactly 4x regardless of image_size, so its contour density per
            # PIXEL (and hence the edge-pixel fraction) is resolution-invariant
            fine = max(image_size // 4, 3)
            self._fine = self._rng.normal(size=(size, fine, fine)).astype(np.float32)

    def __len__(self) -> int:
        return self.size

    @staticmethod
    def _quantize(img: np.ndarray, levels: int = 6) -> np.ndarray:
        lo, hi = img.min(), img.max()
        img = (img - lo) / max(hi - lo, 1e-12)
        return np.floor(img * levels).clip(max=levels - 1) / (levels - 1)

    def __getitem__(self, idx: int) -> np.ndarray:
        img = nifti.resize_bilinear(self._low[idx], self.image_size, self.image_size)
        if self.style == "edges":
            # quantize to L levels: sharp iso-contours at deterministic positions
            img = self._quantize(img)
        elif self.style == "texture":
            fine = nifti.resize_bilinear(self._fine[idx],
                                         self.image_size, self.image_size)
            img = 0.6 * self._quantize(img) + 0.4 * self._quantize(fine)
        else:
            lo, hi = img.min(), img.max()
            img = (img - lo) / max(hi - lo, 1e-12)
        return img.astype(np.float32)[..., None]

    def load_batch(self, indices: Sequence[int]) -> np.ndarray:
        return np.stack([self[i] for i in indices])


class CachedDataset:
    """Decode-once, memory-mapped dataset cache (FFCV-style; see PAPERS.md).

    The reference re-decodes every NIfTI file every epoch. This wrapper decodes the
    whole dataset once into a float32 memmap sized (N, image_size, image_size, 1)
    and serves subsequent epochs straight from page cache — after epoch 0 the host
    cost of a batch is a memcpy. The cache file is keyed by (dataset length,
    image_size) and reused across runs when ``cache_path`` is given.
    """

    def __init__(self, dataset, cache_path=None):
        self.dataset = dataset
        self.image_size = dataset.image_size
        n = len(dataset)
        shape = (n, dataset.image_size, dataset.image_size, 1)
        if cache_path is None:
            self._mm = np.zeros(shape, np.float32)
            self._populate(dataset, n)
        else:
            cache_path = Path(cache_path)
            cache_path.parent.mkdir(parents=True, exist_ok=True)
            if cache_path.exists():
                self._check_meta(cache_path)
                self._mm = np.load(str(cache_path), mmap_mode="r")
                if self._mm.shape != shape:
                    raise ValueError(
                        f"cache {cache_path} has shape {self._mm.shape}, expected "
                        f"{shape} — delete it or point cache_path elsewhere")
            else:
                # populate a temp file and rename atomically: a killed run must
                # not leave a valid-shaped zero-filled cache behind. The pid keeps
                # concurrent populators (multi-host shared fs) from clobbering
                # each other's tmp file; the rename winner is arbitrary but all
                # writers produce identical content.
                tmp = cache_path.with_suffix(f".tmp{os.getpid()}.npy")
                self._mm = np.lib.format.open_memmap(
                    str(tmp), mode="w+", dtype=np.float32, shape=shape)
                self._populate(dataset, n)
                self._mm.flush()
                del self._mm
                # meta BEFORE the rename publishes the cache: a crash in between
                # leaves meta-without-cache (harmlessly rebuilt next run), never a
                # published cache whose provenance can't be checked
                self._write_meta(cache_path)
                os.replace(tmp, cache_path)
                self._mm = np.load(str(cache_path), mmap_mode="r")

    def _populate(self, dataset, n, bs: int = 64):
        for s in range(0, n, bs):
            idx = range(s, min(s + bs, n))
            self._mm[s: s + len(idx)] = dataset.load_batch(idx)

    def _fingerprint(self):
        """Hash of (filename, size, mtime) — shape alone can't detect a swapped
        dataset of the same length."""
        ds = self.dataset
        if not hasattr(ds, "filenames") or not hasattr(ds, "root_dir"):
            return None
        import hashlib
        h = hashlib.sha1()
        for f in ds.filenames:
            st_ = os.stat(Path(ds.root_dir) / f)
            h.update(f"{f}:{st_.st_size}:{st_.st_mtime_ns}".encode())
        return h.hexdigest()

    def _meta_path(self, cache_path):
        return Path(str(cache_path) + ".meta")

    def _write_meta(self, cache_path):
        fp = self._fingerprint()
        if fp is not None:
            self._meta_path(cache_path).write_text(fp)

    def _check_meta(self, cache_path):
        fp = self._fingerprint()
        if fp is None:  # dataset carries no provenance (e.g. synthetic)
            return
        meta = self._meta_path(cache_path)
        if not meta.exists():
            # pre-sidecar cache (built before fingerprinting existed): it was
            # accepted silently then, so adopt it — write today's fingerprint so
            # any FUTURE source change is caught — rather than hard-failing the
            # upgrade. A cache that is ALREADY stale at adoption time is
            # indistinguishable from a fresh one (that was the pre-sidecar
            # behavior too); delete the cache to force a rebuild.
            import warnings
            warnings.warn(
                f"cache {cache_path} has no fingerprint sidecar ({meta.name}); "
                "adopting it and writing the current source fingerprint — "
                "delete the cache file to force a rebuild instead",
                stacklevel=3)
            meta.write_text(fp)
            return
        if meta.read_text() != fp:
            raise ValueError(
                f"cache {cache_path} was built from different source files "
                "(fingerprint mismatch) — delete it to rebuild")

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, idx: int) -> np.ndarray:
        return np.asarray(self._mm[idx])

    def load_batch(self, indices: Sequence[int]) -> np.ndarray:
        return np.asarray(self._mm[np.asarray(indices)])


class DataLoader:
    """Shuffled, batched, background-prefetched host iterator.

    Mirrors torch ``DataLoader(dataset, shuffle=True, batch_size=4,
    drop_last=False)`` (README.md:99) with a decode-ahead thread.
    """

    def __init__(self, dataset, batch_size: int = 4, shuffle: bool = True,
                 drop_last: bool = False, seed: int = 0, prefetch_batches: int = 2,
                 process_index: int = 0, process_count: int = 1):
        """``batch_size`` is always the GLOBAL batch size. In a multi-process
        (multi-host) run, pass ``process_index``/``process_count``: every process
        computes the identical global shuffle (same ``seed`` — required) and each
        yields only its own ``batch_size/process_count`` contiguous shard of every
        batch, so ``jax.make_array_from_process_local_data`` assembles exactly the
        configured global batch with no sample duplicated across hosts. Partial
        final batches are dropped in multi-process mode (they cannot be split
        evenly)."""
        if process_count > 1 and batch_size % process_count != 0:
            raise ValueError(
                f"global batch_size {batch_size} is not divisible by "
                f"process_count {process_count}")
        if not (0 <= process_index < process_count):
            raise ValueError(f"process_index {process_index} out of range for "
                             f"process_count {process_count}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last or process_count > 1
        self.prefetch_batches = prefetch_batches
        self.process_index = process_index
        self.process_count = process_count
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[np.ndarray]:
        return self.iter_batches(0)

    def skip_epoch(self) -> None:
        """Advance the shuffle RNG one epoch without decoding anything (resume
        fast-forward: replaying a completed epoch's permutation keeps later
        epochs' data order identical to an uninterrupted run)."""
        self._epoch_indices()

    def iter_batches(self, start: int = 0) -> Iterator[np.ndarray]:
        """Iterate this epoch's batches starting at batch index ``start`` —
        earlier batches are skipped WITHOUT decoding (resume support)."""
        idx = self._epoch_indices()
        n = len(idx)
        stops = range(0, n - self.batch_size + 1, self.batch_size) if self.drop_last \
            else range(0, n, self.batch_size)
        slices = [idx[s: s + self.batch_size] for s in stops][start:]
        if self.process_count > 1:
            # identical global shuffle on every process (same seed), each process
            # decodes only its contiguous shard of every (full) global batch
            per = self.batch_size // self.process_count
            lo = self.process_index * per
            slices = [sl[lo: lo + per] for sl in slices]
        if self.prefetch_batches <= 0:
            for sl in slices:
                yield self.dataset.load_batch(sl)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        sentinel = object()
        err: List[BaseException] = []
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for sl in slices:
                    if stop.is_set() or not _put(self.dataset.load_batch(sl)):
                        return
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                _put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            # consumer stopped early (e.g. evaluate_mse takes one batch):
            # cancel the producer instead of leaving it blocked on q.put
            stop.set()
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5.0)
        if err:
            raise err[0]


class DeviceDataLoader:
    """HBM-staged loader: the whole decoded dataset lives on device; batches are
    gathered on-device from tiny host-side index transfers.

    The reference decodes + ships every image host->device every step
    (README.md:79-90, 785); the host ``DataLoader`` above already amortizes the
    decode, but still pays one image-batch H2D per step. For datasets that fit
    in HBM (the reference's ~1200 images are 44 MB at 96^2) this loader removes
    the feed from the step's critical path entirely: one ``device_put`` of the
    full dataset at construction, then each batch is ``images[idx]`` under jit
    (idx = batch_size int32s, ~KBs). With a data-parallel ``sharding`` the
    staged images are replicated over the mesh and the gather's output is
    sharded over the data axis — each device slices its own shard locally, no
    collective.

    Epoch semantics (shuffle stream, drop_last, ``skip_epoch``/``iter_batches``
    resume hooks) are identical to ``DataLoader`` with the same seed, so a run
    is bit-identical whichever loader feeds it. Single-process runs only.
    """

    def __init__(self, dataset, batch_size: int = 4, shuffle: bool = True,
                 drop_last: bool = False, seed: int = 0, sharding=None):
        if jax.process_count() > 1:
            raise ValueError(
                "DeviceDataLoader (data.hbm_cache) supports single-process runs "
                "only — in a multi-host run each process can address only its "
                "own devices; use the process-sharded host DataLoader instead")
        import jax.numpy as jnp

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

        n = len(dataset)
        host = dataset.load_batch(range(n))
        if host.nbytes > 2 << 30:
            import warnings
            warnings.warn(
                f"hbm_cache is staging {host.nbytes / 2**30:.1f} GiB of images "
                "in device memory — make sure this fits next to the training "
                "working set", stacklevel=2)
        replicated = None
        if sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            replicated = NamedSharding(sharding.mesh, PartitionSpec())
        self.images = jax.device_put(host, replicated)
        self._gather = jax.jit(
            lambda imgs, idx: jnp.take(imgs, idx, axis=0),
            out_shardings=sharding)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def skip_epoch(self) -> None:
        """Advance the shuffle RNG one epoch without gathering (resume
        fast-forward, same contract as DataLoader.skip_epoch)."""
        self._epoch_indices()

    def __iter__(self) -> Iterator[jax.Array]:
        return self.iter_batches(0)

    def iter_batches(self, start: int = 0) -> Iterator[jax.Array]:
        idx = self._epoch_indices()
        n = len(idx)
        stops = range(0, n - self.batch_size + 1, self.batch_size) if self.drop_last \
            else range(0, n, self.batch_size)
        for s in list(stops)[start:]:
            sl = np.asarray(idx[s: s + self.batch_size], np.int32)
            # the gather dispatch is async: the device batch is "in flight" the
            # moment it is yielded, so device_prefetch's depth works unchanged
            yield self._gather(self.images, sl)


def device_prefetch(iterator: Iterator[np.ndarray], sharding=None,
                    depth: int = 2,
                    global_batch: Optional[int] = None) -> Iterator[jax.Array]:
    """Asynchronously stage host batches into HBM ``depth`` ahead of consumption.

    ``jax.device_put`` is async; holding ``depth`` un-consumed device batches lets
    the H2D DMA overlap the previous step's compute.

    ``global_batch``: the configured global batch size, used to validate the
    multi-host feed. Shapes alone cannot catch a non-process-sharded loader —
    when dim 0 is sharded across processes, jax infers the global dim as
    local x process_count regardless of whether the per-host batches are
    distinct shards or duplicated full batches — so callers that know
    ``cfg.data.batch_size`` should pass it.
    """
    from collections import deque

    multi_host = sharding is not None and jax.process_count() > 1
    buf: "deque[jax.Array]" = deque()
    for host_batch in iterator:
        if multi_host:
            # each process contributes its addressable shard of the global batch;
            # plain device_put cannot target non-addressable devices. The loader
            # must be process-sharded (DataLoader(process_index=, process_count=))
            # so each host holds a DISTINCT global_batch/process_count slice.
            arr = jax.make_array_from_process_local_data(sharding, host_batch)
            if global_batch is not None and arr.shape[0] != global_batch:
                raise ValueError(
                    f"multi-host feed: assembled global batch {arr.shape[0]} != "
                    f"configured batch {global_batch} (local batch "
                    f"{host_batch.shape[0]}, {jax.process_count()} processes) — "
                    "the loader is not process-sharded (pass process_index/"
                    "process_count to DataLoader/make_loader)")
            buf.append(arr)
        else:
            buf.append(jax.device_put(host_batch, sharding))
        if len(buf) > depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def make_dataset(cfg: DataConfig):
    if cfg.synthetic:
        ds = SyntheticDataset(cfg.synthetic_size, cfg.image_size,
                              style=cfg.synthetic_style)
    else:
        ds = NiftiDataset(cfg.root_dir, cfg.image_size, num_workers=cfg.num_workers)
    if cfg.cache:
        path = cfg.cache_path or (None if cfg.synthetic else
                                  str(Path(cfg.root_dir) / f".cache_{cfg.image_size}.npy"))
        ds = CachedDataset(ds, cache_path=path)
    return ds


def make_loader(cfg: DataConfig, seed: int = 0,
                process_index: int = None, process_count: int = None,
                sharding=None, drop_last: Optional[bool] = None):
    """Build the configured loader. In a multi-process run the loader is
    automatically sharded by ``jax.process_index()/process_count()`` (pass
    explicit values to override, e.g. in tests) — each host decodes a distinct
    ``batch_size/process_count`` shard of every global batch.

    ``cfg.hbm_cache`` selects the ``DeviceDataLoader`` (single-process only):
    the decoded dataset is staged in device memory once and batches are
    gathered on-device with the given ``sharding``. ``drop_last`` overrides
    ``cfg.drop_last`` when not None (the loop forces it for grad-accum /
    data-parallel runs)."""
    if process_count is None:
        process_count = jax.process_count()
    if process_index is None:
        process_index = jax.process_index() if process_count > 1 else 0
    if drop_last is None:
        drop_last = cfg.drop_last
    if cfg.hbm_cache:
        # DeviceDataLoader itself raises for multi-process runs; checking
        # process_count here would miss the single-process default path
        return DeviceDataLoader(make_dataset(cfg), batch_size=cfg.batch_size,
                                shuffle=cfg.shuffle, drop_last=drop_last,
                                seed=seed, sharding=sharding)
    return DataLoader(make_dataset(cfg), batch_size=cfg.batch_size,
                      shuffle=cfg.shuffle, drop_last=drop_last, seed=seed,
                      prefetch_batches=cfg.prefetch,
                      process_index=process_index, process_count=process_count)
