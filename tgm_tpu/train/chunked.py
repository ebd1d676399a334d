"""Chunked host->device streaming epochs for datasets larger than HBM.

``DeviceEdgeStream`` uploads a whole split once — the right call when the
split's arrays fit in HBM (tgbl-wiki: ~108 MB of edge features), but the
reference's *large* perf tier (tgbl-flight ~67M edges, tgbn-reddit —
/root/reference/test/performance/conftest.py:10-17) carries edge-feature
tables of tens of GB against 16 GB of v5e HBM. The reference handles such
data with host-side per-batch slicing
(/root/reference/tgm/core/_storage/backends/array_backend.py:57-68) — i.e.
its slow path IS its large path. On TPU a per-batch host loop forfeits the
scanned execution model, so this module keeps the scan and streams the data:

* the epoch is split into K super-chunks of ``chunk_batches`` windows each;
* each chunk's arrays are ``jax.device_put`` by a prefetch thread while the
  previous chunk's ``lax.scan`` runs on device (through the remote-TPU
  tunnel ``device_put`` blocks its calling thread, so overlap needs a real
  thread, not dispatch-async);
* each chunk's device buffers are dropped as soon as the scan consuming
  them has synced, so their HBM is released before the over-next upload.

Peak device residency is therefore 2 chunks + model/hook state, independent
of dataset size. Measured idle tunnel H2D is ~1.3-1.6 GB/s — about
2M 172-dim-f32 edges/s of feature traffic — comfortably above the ~300k
edges/s TGN compute rate, so the transfers hide behind compute entirely.

Remote-tunnel H2D quirk (measured 2026-08): the FIRST device->host transfer
of any kind (``np.asarray``, ``float(x)``, even ``copy_to_host_async`` of an
8-float array) permanently flips the tunnel's H2D path from ~1.5 GB/s to
~75 MB/s for the rest of the process — a 20x degradation that never
recovers. A fetch-free epoch is NOT an option: for this chunk program the
remote client executes lazily — ``block_until_ready`` and ``is_ready``
return immediately and compile/compute only happen at the first fetch — so
the per-chunk scalar fetch below is the only honest synchronization (it
bounds live chunks at two AND forces execution). Designing for the degraded
bandwidth instead:

* ``feat_dtype=ml_dtypes.bfloat16`` halves feature bytes in transit
  (``batch_at`` casts back to f32 on device); at 75 MB/s a 500-batch
  172-dim chunk uploads in ~0.45 s vs ~0.5 s compute — hidden.
* the NEXT epoch's first chunk is prefetched while the current epoch's last
  chunk computes, so steady-state epochs never expose an unoverlapped
  upload (only the very first epoch pays ``put_chunk(0)`` serially).

On a local TPU host (PCIe DMA) the flip does not exist and the same design
simply runs further from the bandwidth ceiling.

Hook-state note: datasets bigger than HBM rule out the eid recency layout
(it gathers features from a device-resident full ``edge_x`` table at query
time); use the default feature-carrying layout (``edge_x_full=None``),
whose buffers hold the K most recent edge features by value and therefore
scale with num_nodes, not num_edges.
"""

from __future__ import annotations

import math
import weakref
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import PADDED_NODE_ID
from ..core.batch import DGBatch
from ..core.graph import DGraph


class ChunkedEdgeStream:
    """Host-resident edge events served as device-resident super-chunks.

    The batch plan (window boundaries, counts, global edge ids) is identical
    to ``DeviceEdgeStream``'s for the same ``batch_size`` — a chunked epoch
    consumes exactly the same batch sequence as a resident scanned epoch, so
    the two are bit-equivalent. Only device residency differs.
    """

    def __init__(
        self,
        dg: DGraph,
        batch_size: int,
        chunk_batches: int,
        include_features: bool = True,
        edge_id_base: Optional[int] = None,
        feat_dtype: Optional[Any] = None,
    ):
        if edge_id_base is None:
            edge_id_base = int(getattr(dg._storage._data, "edge_global_offset", 0))
        src, dst, t = dg._storage.get_edges(dg._slice)
        edge_x = dg._storage.get_edge_x(dg._slice) if include_features else None
        self._init_from_arrays(
            src, dst, t, edge_x, batch_size, chunk_batches, edge_id_base, feat_dtype
        )

    @classmethod
    def from_arrays(
        cls,
        src: np.ndarray,
        dst: np.ndarray,
        t: np.ndarray,
        edge_x: Optional[np.ndarray],
        batch_size: int,
        chunk_batches: int,
        edge_id_base: int = 0,
        feat_dtype: Optional[Any] = None,
    ) -> "ChunkedEdgeStream":
        self = cls.__new__(cls)
        self._init_from_arrays(
            src, dst, t, edge_x, batch_size, chunk_batches, edge_id_base, feat_dtype
        )
        return self

    def _init_from_arrays(self, src, dst, t, edge_x, batch_size, chunk_batches,
                          edge_id_base, feat_dtype):
        if chunk_batches < 1:
            raise ValueError(f"chunk_batches must be >= 1, got {chunk_batches}")
        E = len(src)
        self.num_edges = E
        self.batch_size = B = batch_size
        self.num_batches = max(1, math.ceil(E / B))
        self.chunk_batches = min(chunk_batches, self.num_batches)
        self.num_chunks = math.ceil(self.num_batches / self.chunk_batches)
        self._edge_id_base = edge_id_base

        pad = self.num_batches * B - E
        # Host copies stay numpy; chunks of them are device_put per epoch.
        # pad == 0 keeps the caller's arrays by reference — at large-tier
        # sizes the feature table is tens of GB and must not be duplicated.
        if pad:
            padi = lambda x, fill, dt: np.concatenate(
                [np.asarray(x, dt), np.full(pad, fill, dt)]
            )
        else:
            padi = lambda x, fill, dt: np.ascontiguousarray(x, dt)
        self._src = padi(src, PADDED_NODE_ID, np.int32)
        self._dst = padi(dst, PADDED_NODE_ID, np.int32)
        self._t = padi(t, 0, np.int32)

        self._edge_x: Optional[np.ndarray] = None
        self.edge_dim = 0
        if edge_x is not None:
            self.edge_dim = edge_x.shape[1]
            dt = np.dtype(feat_dtype) if feat_dtype is not None else edge_x.dtype
            if pad or edge_x.dtype != dt:
                xp = np.zeros((self.num_batches * B, self.edge_dim), dt)
                xp[:E] = edge_x
                self._edge_x = xp
            else:
                self._edge_x = np.ascontiguousarray(edge_x)

        counts = np.full(self.num_batches, B, np.int32)
        if pad:
            counts[-1] = B - pad
        self._counts = counts

    # ------------------------------------------------------------------ #
    # Chunk upload
    # ------------------------------------------------------------------ #
    def _chunk_len(self, k: int) -> int:
        c0 = k * self.chunk_batches
        return min(self.chunk_batches, self.num_batches - c0)

    @property
    def chunk_nbytes(self) -> int:
        """Device bytes of one full chunk (the HBM working-set unit)."""
        B, C = self.batch_size, self.chunk_batches
        per_edge = 3 * 4  # src, dst, t int32
        if self._edge_x is not None:
            per_edge += self.edge_dim * self._edge_x.dtype.itemsize
        return C * B * per_edge + C * 4 + 4

    def put_chunk(self, k: int) -> dict:
        """Upload chunk ``k``'s arrays; blocks until the transfer lands.

        Called from the prefetch thread so the block overlaps device compute.
        """
        B = self.batch_size
        c0 = k * self.chunk_batches
        ck = self._chunk_len(k)
        lo, hi = c0 * B, (c0 + ck) * B
        host = {
            "src": self._src[lo:hi],
            "dst": self._dst[lo:hi],
            "t": self._t[lo:hi],
            "counts": self._counts[c0:c0 + ck],
            "base": np.int32(self._edge_id_base + lo),
        }
        if self._edge_x is not None:
            host["x"] = self._edge_x[lo:hi]
        chunk = jax.device_put(host)
        jax.block_until_ready(chunk)
        return chunk

    # ------------------------------------------------------------------ #
    # Traced batch window
    # ------------------------------------------------------------------ #
    def batch_at(self, chunk: dict, i: jnp.ndarray) -> DGBatch:
        """Materialize chunk-local batch ``i`` (traceable)."""
        B = self.batch_size
        start = i * B
        valid = jnp.arange(B) < chunk["counts"][i]
        sl = lambda a: lax.dynamic_slice_in_dim(a, start, B)
        batch = DGBatch(
            edge_src=jnp.where(valid, sl(chunk["src"]), PADDED_NODE_ID),
            edge_dst=jnp.where(valid, sl(chunk["dst"]), PADDED_NODE_ID),
            edge_time=jnp.where(valid, sl(chunk["t"]), 0),
            edge_valid=valid,
        )
        batch.edge_ids = jnp.where(
            valid, chunk["base"] + start + jnp.arange(B, dtype=jnp.int32), -1
        )
        if "x" in chunk:
            x = lax.dynamic_slice_in_dim(chunk["x"], start, B)
            if x.dtype != jnp.float32:
                x = x.astype(jnp.float32)
            batch.edge_x = jnp.where(valid[:, None], x, 0.0)
        return batch


def chunked_hook_epoch(
    stream: ChunkedEdgeStream,
    hm: Any,
    key: str,
    dg: DGraph,
    step_fn: Callable[[Any, Any], Tuple[Any, Any]],
    donate: bool = True,
):
    """Compile a chunk-streamed epoch over ``stream`` with ``key``'s hooks.

    Same contract as ``scanned_hook_epoch`` (train/hook_pipeline.py):
    returns ``(epoch_fn, init_hook_states)`` with
    ``epoch_fn(carry, hook_states) -> (carry, hook_states, outs)``; ``outs``
    comes back as a host numpy array (the per-chunk sync fetches it anyway —
    the only honest sync on the remote runtime, see module docstring).

    The epoch runs ``stream.num_chunks`` invocations of one jitted
    chunk-scan program (two if the last chunk is shorter); chunk ``k+1``
    uploads on a prefetch thread while chunk ``k`` computes, each chunk's
    buffers are reference-dropped after the scan consuming them has synced
    (at most two chunks HBM-live), and chunk 0 of the NEXT epoch is
    prefetched under the last chunk's compute so repeated epochs never
    expose an unoverlapped first upload.
    """
    hook_fn, init_states = hm.as_transform(key, dg)

    def chunk_scan(carry, hstates, chunk, n):
        def body(c, i):
            carry, hs = c
            batch = stream.batch_at(chunk, i)
            hs, batch = hook_fn(hs, batch)
            carry, out = step_fn(carry, batch)
            return (carry, hs), out

        (carry, hstates), outs = lax.scan(
            body, (carry, hstates), jnp.arange(n)
        )
        return carry, hstates, outs

    # Donate only the model carry (threaded through chunk calls). Chunk
    # buffers are freed by reference-dropping after the per-chunk sync —
    # donating them only triggers XLA's "donated buffers were not usable"
    # warning (no output matches their shapes). Hook states stay undonated
    # for the same aliasing reason as scanned_hook_epoch: the first call's
    # states can alias the hooks' live ``h.state`` buffers.
    jit_chunk = jax.jit(
        chunk_scan, static_argnums=(3,),
        donate_argnums=(0,) if donate else (),
    )

    # Long-lived prefetch thread + the cross-epoch pending chunk-0 future:
    # epoch e+1's first upload overlaps epoch e's last chunk compute.
    ex = ThreadPoolExecutor(1)
    pending: list = []

    def close() -> None:
        """Release the prefetched chunk's device buffers and stop the
        prefetch thread. Idempotent; also runs via weakref.finalize when the
        returned epoch fn is garbage-collected, so callers that loop epochs
        keep the cross-epoch prefetch and one-shot callers don't leak an
        executor thread + one HBM-live chunk per chunked_hook_epoch call
        (ADVICE r3)."""
        while pending:
            fut = pending.pop()
            try:
                fut.result()  # let an in-flight upload land, then drop it
            except Exception:
                pass
        ex.shutdown(wait=True)

    def epoch(carry, hook_states):
        outs = []
        fut = pending.pop() if pending else ex.submit(stream.put_chunk, 0)
        for k in range(stream.num_chunks):
            chunk = fut.result()
            if k + 1 < stream.num_chunks:
                fut = ex.submit(stream.put_chunk, k + 1)
            carry, hook_states, o = jit_chunk(
                carry, hook_states, chunk, stream._chunk_len(k)
            )
            if k + 1 == stream.num_chunks:
                # Last chunk dispatched: start the NEXT epoch's first
                # upload under its compute.
                pending.append(ex.submit(stream.put_chunk, 0))
            # Per-chunk sync: bounds live chunks at two (this one
            # finishing, the next one uploading). Fetch-as-sync — the
            # per-chunk outs are tiny (one scalar per batch), and on the
            # remote runtime a fetch is the only sync that truly forces
            # execution (module docstring). The chunk reference dies at
            # the next loop iteration's rebind, after the compute
            # consuming it has finished.
            outs.append(jax.tree.map(np.asarray, o))
            del chunk
        stacked = jax.tree.map(lambda *xs: np.concatenate(xs), *outs)
        return carry, hook_states, stacked

    epoch.close = close
    weakref.finalize(epoch, close)
    return epoch, init_states


__all__ = ["ChunkedEdgeStream", "chunked_hook_epoch"]
