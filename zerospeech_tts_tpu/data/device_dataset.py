"""Device-resident dataset — TPU-native replacement for per-step host
batching (no referent in the reference, which feeds batches from h5 via a
torch DataLoader; SURVEY.md §2 "Data loader").

The entire train split's feature frames are staged into device HBM ONCE as
a flat arena ``[total_frames, n_feat]`` plus per-utterance
(start, len, speaker) arrays. Segment batches are then sampled INSIDE the
jitted train step (uniform over utterances weighted by the number of valid
segment positions — matching the reference's pre-sampled uniform segment
index in distribution) with ``lax.dynamic_slice`` gathers. Combined with
``Solver.train_many`` (K steps per dispatch under ``lax.scan``) this
removes all host<->device traffic and dispatch latency from the training
loop.

Memory: ZeroSpeech'19 English train lin features are ~9 GB f32 — they fit
a 16 GB v5e chip; mel-only is ~1.4 GB. bf16 staging halves this
(``dtype=jnp.bfloat16``).
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


@jax.tree_util.register_pytree_node_class
class DeviceDataset:
    def __init__(self, arena, starts, lens, spk, real_mask, hps: Hps):
        self.arena = arena          # [total_frames, F] on device
        self.starts = starts        # [U] int32
        self.lens = lens            # [U] int32
        self.spk = spk              # [U] int32
        self.real_mask = real_mask  # [U] bool: utterance belongs to a target speaker
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
        import json

        if stats is None and hps.speaker_norm:
            from zerospeech_tts_tpu.data.speaker_norm import SpeakerStats

            stats = SpeakerStats.load(h5_path, feat)
        if stats is False:
            stats = None

        chunks, starts, lens, spks, real = [], [], [], [], []
        pos = 0
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
                    starts.append(pos)
                    lens.append(arr.shape[0])
                    spks.append(speakers[spk_name])
                    real.append(spk_name in tgt)
                    pos += arr.shape[0]
        if not chunks:
            raise ValueError(f"no usable utterances in {h5_path}:{split}")
        real = np.asarray(real)
        if not real.any():
            real = np.ones_like(real)  # no targets known -> all speakers are "real"
        arena = jnp.asarray(np.concatenate(chunks, axis=0), dtype=dtype)
        return cls(
            arena,
            jnp.asarray(np.asarray(starts), jnp.int32),
            jnp.asarray(np.asarray(lens), jnp.int32),
            jnp.asarray(np.asarray(spks), jnp.int32),
            jnp.asarray(real),
            hps,
        )

    # ------------------------------------------------------- jit-side sampling

    def _gather(self, starts: jnp.ndarray) -> jnp.ndarray:
        seg = self.hps.seg_len

        def one(s):
            return jax.lax.dynamic_slice(self.arena, (s, 0), (seg, self.arena.shape[1]))

        return jax.vmap(one)(starts).astype(jnp.float32)

    def _sample_from(self, rng: jax.Array, batch: int, weights: jnp.ndarray):
        """Sample (x [B, seg, F], spk [B], idx, t0) with utterances drawn ∝
        weights * n_valid_positions (the distribution of the reference's
        segment index)."""
        seg = self.hps.seg_len
        n_pos = jnp.maximum(self.lens - seg + 1, 0).astype(jnp.float32)
        w = n_pos * weights
        k1, k2 = jax.random.split(rng)
        idx = jax.random.categorical(k1, jnp.log(w + 1e-30), shape=(batch,))
        u = jax.random.uniform(k2, (batch,))
        t0 = (u * n_pos[idx]).astype(jnp.int32)
        x = self._gather(self.starts[idx] + t0)
        return x, self.spk[idx], idx, t0

    def sample_batch(self, rng: jax.Array, batch: int | None = None, pairs: bool = True) -> dict:
        """Traceable batch sampler: stage-1 fields (incl. the reference's
        same-utterance pair x2 + its frame offset pair_dt, snapped to the
        hps.downsample grid so latent frames align) + stage-2 reals.
        pairs=False drops the pair gathers (phases that don't consume x2)."""
        h = self.hps
        batch = batch or h.batch_size
        k1, k2, k3 = jax.random.split(rng, 3)
        ones = jnp.ones_like(self.lens, jnp.float32)
        x, spk, idx, t0 = self._sample_from(k1, batch, ones)
        x_real, spk_real, _, _ = self._sample_from(k2, batch, self.real_mask.astype(jnp.float32))
        out = {"x": x, "spk": spk, "x_real": x_real, "spk_real": spk_real}
        if not pairs:
            return out

        # same-utterance pair: offset uniform on the downsample grid within
        # ±seg_len, clamped (on-grid) to the utterance's valid positions
        ds = h.downsample
        n_pos_i = jnp.maximum(self.lens[idx] - h.seg_len + 1, 1)
        d_raw = ds * jax.random.randint(k3, (batch,), -(h.seg_len // ds), h.seg_len // ds + 1)
        d = jnp.clip(d_raw, -(t0 // ds) * ds, ((n_pos_i - 1 - t0) // ds) * ds)
        out["x2"] = self._gather(self.starts[idx] + t0 + d)
        out["pair_dt"] = d.astype(jnp.int32)
        return out
