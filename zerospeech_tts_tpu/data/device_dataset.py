"""Device-resident datasets — TPU-native replacement for per-step host
batching (no referent in the reference, which feeds batches from h5 via a
torch DataLoader; SURVEY.md §2 "Data loader").

:class:`DeviceDataset` stages the entire train split's feature frames into
device HBM ONCE as a flat arena ``[total_frames, n_feat]`` plus
per-utterance (start, len, speaker) arrays. Segment batches are then
sampled INSIDE the jitted train step (uniform over utterances weighted by
the number of valid segment positions — matching the reference's
pre-sampled uniform segment index in distribution) with
``lax.dynamic_slice`` gathers. Combined with ``Solver.train_many``
(K steps per dispatch under ``lax.scan``) this removes all host<->device
traffic and dispatch latency from the training loop.

:class:`ShardedDeviceDataset` is the multi-chip variant: the corpus is
partitioned over the mesh ``data`` axis (each device stores ~1/D of the
utterances; the few target-voice utterances are REPLICATED to every shard
so stage-2 real/fake sampling keeps its exact semantics) and each device
samples its slice of the global batch locally inside ``shard_map`` — HBM
cost drops from corpus-per-chip to corpus/D, with no cross-device gathers.

Memory: ZeroSpeech'19 English train lin features are ~9 GB f32 — they fit
a 16 GB v5e chip; mel-only is ~1.4 GB. bf16 staging halves this
(``dtype=jnp.bfloat16``); the sharded variant divides it by the mesh.
"""

from __future__ import annotations

from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from zerospeech_tts_tpu.config import Hps


def check_speaker_ids(speakers: dict, hps: Hps) -> None:
    """Fail fast when corpus speaker ids exceed hps.n_speakers: nn.Embed /
    integer-label CE clamp out-of-range ids SILENTLY under jit, so an
    undersized table corrupts speaker conditioning and classifier labels
    without any error (same silent-mismatch class as the n_feat guard)."""
    if not speakers:
        return
    top = max(speakers, key=speakers.get)
    if speakers[top] >= hps.n_speakers:
        raise ValueError(
            f"corpus speaker ids reach {speakers[top]} ({top!r}) but "
            f"hps.n_speakers={hps.n_speakers} — raise n_speakers to at least "
            f"{speakers[top] + 1} (out-of-range ids would be clamped silently)"
        )


def _load_utterances(h5_path, hps: Hps, feat: str, split: str, target_speakers, stats):
    """Read usable utterances: (feature arrays, speaker ids, is_target)."""
    import json

    if stats is None and hps.speaker_norm:
        from zerospeech_tts_tpu.data.speaker_norm import SpeakerStats

        stats = SpeakerStats.load(h5_path, feat)
    if stats is False:
        stats = None

    chunks, spks, real = [], [], []
    with h5py.File(h5_path, "r") as f:
        speakers = json.loads(f.attrs["speakers"])
        check_speaker_ids(speakers, hps)
        tgt = set(target_speakers or [])
        for spk_name in f[split]:
            for utt in f[split][spk_name]:
                arr = f[f"{split}/{spk_name}/{utt}/{feat}"][:]
                if arr.shape[1] != hps.n_feat:
                    raise ValueError(
                        f"hps.n_feat={hps.n_feat} but corpus {feat!r} features "
                        f"have {arr.shape[1]} bins — check --feat / hps"
                    )
                if arr.shape[0] < hps.seg_len + 1:
                    continue
                if stats is not None:
                    arr = stats.normalize(arr, spk_name)
                chunks.append(arr)
                spks.append(speakers[spk_name])
                real.append(spk_name in tgt)
    if not chunks:
        raise ValueError(f"no usable utterances in {h5_path}:{split}")
    real = np.asarray(real)
    if not real.any():
        real = np.ones_like(real)  # no targets known -> all speakers are "real"
    return chunks, np.asarray(spks, np.int32), real


# --------------------------------------------------------------------------
# pure jit-side sampling over an arena (shared by both dataset classes)
# --------------------------------------------------------------------------


def _arena_gather(arena, starts, seg: int):
    def one(s):
        return jax.lax.dynamic_slice(arena, (s, 0), (seg, arena.shape[1]))

    return jax.vmap(one)(starts).astype(jnp.float32)


def _arena_sample(arena, starts, lens, spk, weights, key, seg: int, batch: int):
    """Sample (x [B, seg, F], spk [B], idx, t0) with utterances drawn ∝
    weights * n_valid_positions (the distribution of the reference's
    segment index)."""
    n_pos = jnp.maximum(lens - seg + 1, 0).astype(jnp.float32)
    w = n_pos * weights
    k1, k2 = jax.random.split(key)
    idx = jax.random.categorical(k1, jnp.log(w + 1e-30), shape=(batch,))
    u = jax.random.uniform(k2, (batch,))
    t0 = (u * n_pos[idx]).astype(jnp.int32)
    x = _arena_gather(arena, starts[idx] + t0, seg)
    return x, spk[idx], idx, t0


def _arena_batch(
    arena, starts, lens, spk, real_w, key, hps: Hps, batch: int, pairs: bool, x_w=None
):
    """One training batch dict from an arena: stage-1 fields (incl. the
    reference's same-utterance pair x2 + grid-snapped offset pair_dt when
    ``pairs``) + stage-2 reals. ``x_w`` overrides the uniform per-utterance
    base weight of the x/pair draw (the sharded dataset uses 1/D on
    utterances replicated to every shard so they aren't oversampled)."""
    h = hps
    k1, k2, k3 = jax.random.split(key, 3)
    base = jnp.ones_like(lens, jnp.float32) if x_w is None else x_w
    x, spk_b, idx, t0 = _arena_sample(arena, starts, lens, spk, base, k1, h.seg_len, batch)
    x_real, spk_real, _, _ = _arena_sample(arena, starts, lens, spk, real_w, k2, h.seg_len, batch)
    out = {"x": x, "spk": spk_b, "x_real": x_real, "spk_real": spk_real}
    if not pairs:
        return out

    # same-utterance pair: offset uniform on the downsample grid within
    # ±seg_len, clamped (on-grid) to the utterance's valid positions
    ds = h.downsample
    n_pos_i = jnp.maximum(lens[idx] - h.seg_len + 1, 1)
    d_raw = ds * jax.random.randint(k3, (batch,), -(h.seg_len // ds), h.seg_len // ds + 1)
    d = jnp.clip(d_raw, -(t0 // ds) * ds, ((n_pos_i - 1 - t0) // ds) * ds)
    out["x2"] = _arena_gather(arena, starts[idx] + t0 + d, h.seg_len)
    out["pair_dt"] = d.astype(jnp.int32)
    return out


def _pack_arena(chunks, spks, real, dtype):
    """Concatenate utterances into (arena, starts, lens, spk, real_w)."""
    starts, pos = [], 0
    for arr in chunks:
        starts.append(pos)
        pos += arr.shape[0]
    lens = np.asarray([a.shape[0] for a in chunks], np.int32)
    real = np.asarray(real, bool)
    real_w = real.astype(np.float32)
    if not real_w.any():
        real_w = np.ones_like(real_w)
    arena = np.concatenate(chunks, axis=0).astype(
        np.float32 if dtype == jnp.float32 else np.float32  # cast below on device
    )
    return arena, np.asarray(starts, np.int32), lens, np.asarray(spks, np.int32), real_w


@jax.tree_util.register_pytree_node_class
class DeviceDataset:
    supports_pairs = True  # sample_batch implements the pair fields (solver protocol)

    def __init__(self, arena, starts, lens, spk, real_mask, hps: Hps):
        self.arena = arena          # [total_frames, F] on device
        self.starts = starts        # [U] int32
        self.lens = lens            # [U] int32
        self.spk = spk              # [U] int32
        self.real_mask = real_mask  # [U] float32 weights (target speakers)
        self.hps = hps

    def tree_flatten(self):
        return (self.arena, self.starts, self.lens, self.spk, self.real_mask), self.hps

    @classmethod
    def tree_unflatten(cls, hps, children):
        return cls(*children, hps)

    @classmethod
    def from_h5(
        cls,
        h5_path: str | Path,
        hps: Hps,
        feat: str = "lin",
        split: str = "train",
        target_speakers: list[str] | None = None,
        dtype=jnp.float32,
        stats=None,  # None -> auto-load when hps.speaker_norm; False -> disable
    ) -> "DeviceDataset":
        chunks, spks, real = _load_utterances(h5_path, hps, feat, split, target_speakers, stats)
        arena, starts, lens, spk, real_w = _pack_arena(chunks, spks, real, dtype)
        return cls(
            jnp.asarray(arena, dtype=dtype),
            jnp.asarray(starts),
            jnp.asarray(lens),
            jnp.asarray(spk),
            jnp.asarray(real_w),
            hps,
        )

    # ------------------------------------------------------- jit-side sampling

    def sample_batch(self, rng: jax.Array, batch: int | None = None, pairs: bool = True) -> dict:
        """Traceable batch sampler: stage-1 fields (incl. the reference's
        same-utterance pair x2 + its frame offset pair_dt, snapped to the
        hps.downsample grid so latent frames align) + stage-2 reals.
        pairs=False drops the pair gathers (phases that don't consume x2)."""
        h = self.hps
        real_w = self.real_mask.astype(jnp.float32)
        return _arena_batch(
            self.arena, self.starts, self.lens, self.spk, real_w, rng, h,
            batch or h.batch_size, pairs,
        )


@jax.tree_util.register_pytree_node_class
class ShardedDeviceDataset:
    """Corpus sharded over the mesh ``data`` axis (SURVEY.md §5 comm-backend
    row: scaling via shardings + collectives only).

    Layout: stacked per-shard arrays with a leading shard axis, placed
    with ``NamedSharding(mesh, P('data', ...))`` — each device's HBM holds
    exactly its shard. ``sample_batch`` runs the SAME arena sampler as
    :class:`DeviceDataset` per device inside ``shard_map`` (each device
    draws batch/D segments from its local utterances with a
    device-folded key) and returns globally-sharded batch arrays, so
    ``Solver.train_many`` consumes it unchanged. Non-target utterances
    are round-robin partitioned; target-voice utterances are replicated
    to every shard so stage-2 real sampling keeps its exact semantics."""

    supports_pairs = True  # sample_batch implements the pair fields (solver protocol)

    def __init__(self, arena, starts, lens, spk, real_w, x_w, hps: Hps, mesh):
        self.arena = arena      # [D, Lmax, F] sharded P('data')
        self.starts = starts    # [D, Umax] int32
        self.lens = lens        # [D, Umax] int32 (0 = padding slot)
        self.spk = spk          # [D, Umax] int32
        self.real_w = real_w    # [D, Umax] float32
        self.x_w = x_w          # [D, Umax] float32: 1/D on replicated reals
        self.hps = hps
        self.mesh = mesh

    def tree_flatten(self):
        return (
            (self.arena, self.starts, self.lens, self.spk, self.real_w, self.x_w),
            (self.hps, self.mesh),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        hps, mesh = aux
        return cls(*children, hps, mesh)

    @classmethod
    def from_h5(
        cls,
        h5_path: str | Path,
        hps: Hps,
        mesh,
        feat: str = "lin",
        split: str = "train",
        target_speakers: list[str] | None = None,
        dtype=jnp.float32,
        stats=None,
    ) -> "ShardedDeviceDataset":
        from jax.sharding import NamedSharding, PartitionSpec as P

        chunks, spks, real = _load_utterances(h5_path, hps, feat, split, target_speakers, stats)
        d_sz = mesh.shape["data"]
        real_idx = [i for i in range(len(chunks)) if real[i]]
        rest_idx = [i for i in range(len(chunks)) if not real[i]]
        if not rest_idx:  # everything is "real": plain round-robin
            real_idx, rest_idx = [], list(range(len(chunks)))
        n_real = len(real_idx)
        shards = []
        for d in range(d_sz):
            mine = real_idx + rest_idx[d::d_sz]
            if not mine:
                raise ValueError(
                    f"corpus has fewer non-target utterances ({len(rest_idx)}) "
                    f"than mesh data={d_sz} shards"
                )
            packed = _pack_arena(
                [chunks[i] for i in mine],
                [spks[i] for i in mine],
                [bool(real[i]) for i in mine],
                dtype,
            )
            # replicated reals carry 1/D base weight in the x draw so the
            # GLOBAL sampling distribution matches the unsharded dataset
            x_w = np.ones(len(mine), np.float32)
            x_w[:n_real] = 1.0 / d_sz
            shards.append(packed + (x_w,))

        l_max = max(s[0].shape[0] for s in shards)
        u_max = max(s[1].shape[0] for s in shards)

        def pad(sh):
            arena, starts, lens, spk, real_w, x_w = sh
            arena = np.pad(arena, ((0, l_max - arena.shape[0]), (0, 0)))
            pu = u_max - starts.shape[0]
            # padding utterance slots: len 0 -> zero sampling weight
            return (
                arena,
                np.pad(starts, (0, pu)),
                np.pad(lens, (0, pu)),
                np.pad(spk, (0, pu)),
                np.pad(real_w, (0, pu)),
                np.pad(x_w, (0, pu)),
            )

        stacked = [np.stack(parts) for parts in zip(*(pad(s) for s in shards))]
        sharded = [
            jax.device_put(
                jnp.asarray(a, dtype=dtype if i == 0 else None),
                NamedSharding(mesh, P("data")),
            )
            for i, a in enumerate(stacked)
        ]
        return cls(*sharded, hps, mesh)

    def sample_batch(self, rng: jax.Array, batch: int | None = None, pairs: bool = True) -> dict:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        h = self.hps
        batch = batch or h.batch_size
        d_sz = self.mesh.shape["data"]
        if batch % d_sz:
            raise ValueError(f"batch_size {batch} must divide by mesh data={d_sz}")
        b_loc = batch // d_sz

        def local(key, arena, starts, lens, spk, real_w, x_w):
            k = jax.random.fold_in(key, jax.lax.axis_index("data"))
            return _arena_batch(
                arena[0], starts[0], lens[0], spk[0], real_w[0], k, h, b_loc, pairs,
                x_w=x_w[0],
            )

        return shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(),) + (P("data"),) * 6,
            out_specs=P("data"),
            check_vma=False,
        )(rng, self.arena, self.starts, self.lens, self.spk, self.real_w, self.x_w)
