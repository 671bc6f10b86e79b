"""Solver — the training runtime (ref solver.py:~1-500; SURVEY.md §2/§3.2-3.3).

Reference contract being rebuilt:

* stage-1 phases (ref ``Solver.train(model_path, flag, mode)``):
  ``pretrain_AE`` (reconstruction only), ``pretrain_C`` (speaker classifier
  on latents), ``train`` (alternating classifier step + adversarial
  autoencoder step, with the adversarial weight annealed over
  ``lat_sched_iters`` — ref encode_step/decode_step/clf_step).
* stage-2 ``patchGAN`` (ref patch_step/gen_step): WGAN-GP patch critic with
  auxiliary speaker head, n_critic D steps per G step, generator =
  stage-1 decoder fine-tuned toward sampled target speakers (ref sample_c).

TPU-first design (not a torch translation): every phase is ONE jitted,
donated step function over a TrainState pytree — classifier update and
adversarial AE update fuse into a single XLA program; the WGAN gradient
penalty differentiates through the critic inside the same program. Batch
sharding across the mesh happens by placing the batch with a
NamedSharding and letting pjit insert the psum for the grads (see
zerospeech_tts_tpu.parallel); the step functions themselves stay
sharding-agnostic.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from zerospeech_tts_tpu.config import Hps
from zerospeech_tts_tpu.models import (
    Decoder,
    Encoder,
    PatchDiscriminator,
    SpeakerClassifier,
    discretize,
)

Params = Any


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    train_start: jnp.ndarray  # global step at which the 'train' phase began (-1 = not yet)
    rng: jax.Array
    enc: Params
    dec: Params
    clf: Params
    dis: Params
    opt_enc: Any
    opt_dec: Any
    opt_clf: Any
    opt_dis: Any


def _ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def _acc(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return (jnp.argmax(logits, -1) == labels).mean()


class Solver:
    """Owns the four modules + four Adam optimizers (ref Solver.__init__)."""

    def __init__(self, hps: Hps, gru_impl: str | None = None):
        self.hps = hps
        if gru_impl is None:
            # auto: whole-recurrence Pallas GRU kernel on TPU (training
            # differentiates through it via the custom-VJP backward kernel
            # in ops/pallas_gru — same params, same math up to matmul
            # reassociation; ZSTTS_NO_PALLAS_GRU=1 opts out, matching the
            # Converter). Unsupported shapes fall back to lax.scan inside
            # models.layers.GRU.
            import os

            # single chip only: the jitted train steps rely on XLA to
            # partition over a multi-device mesh, and pallas_call is not
            # auto-partitionable — multichip training keeps the scan
            # (the sharded CONVERSION path routes Pallas through an
            # explicit shard_map instead; see convert.py)
            gru_impl = (
                "pallas"
                if jax.default_backend() == "tpu"
                and jax.device_count() == 1
                and not os.environ.get("ZSTTS_NO_PALLAS_GRU")
                else "scan"
            )
        assert gru_impl in ("scan", "pallas"), gru_impl
        self.encoder = Encoder(hps, gru_impl=gru_impl)
        self.decoder = Decoder(hps, gru_impl=gru_impl)
        self.classifier = SpeakerClassifier(hps)
        self.discriminator = PatchDiscriminator(hps)
        self.tx = optax.chain(
            optax.clip_by_global_norm(hps.max_grad_norm),
            optax.adam(hps.lr, b1=hps.beta1, b2=hps.beta2),
        )

    # ------------------------------------------------------------- state

    def init_state(self, rng: jax.Array) -> TrainState:
        h = self.hps
        ke, kd, kc, kp, kr = jax.random.split(rng, 5)
        x = jnp.zeros((1, h.seg_len, h.n_feat), jnp.float32)
        z = jnp.zeros((1, h.n_bins, h.emb_size), jnp.float32)
        spk = jnp.zeros((1,), jnp.int32)
        enc = self.encoder.init(ke, x)
        dec = self.decoder.init(kd, z, spk)
        clf = self.classifier.init(kc, z)
        dis = self.discriminator.init(kp, x)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            train_start=jnp.full((), -1, jnp.int32),
            rng=kr,
            enc=enc,
            dec=dec,
            clf=clf,
            dis=dis,
            opt_enc=self.tx.init(enc),
            opt_dec=self.tx.init(dec),
            opt_clf=self.tx.init(clf),
            opt_dis=self.tx.init(dis),
        )

    # ------------------------------------------------------- shared pieces

    def _encode_latent(self, enc_params, x, rng, train: bool):
        """encode_step: spectrogram -> discretized latent (ref encode_step)."""
        h = self.hps
        rngs = {"dropout": rng} if train else {}
        k_gumbel = jax.random.fold_in(rng, 1)
        logits = self.encoder.apply(enc_params, x, train=train, rngs=rngs)
        z = discretize(logits, h.enc_mode, h.gumbel_temp, k_gumbel if train else None)
        return z

    def _alpha(self, step, train_start):
        """Adversarial-weight annealing over lat_sched_iters (ref solver).

        The ramp is relative to the RECORDED start of the 'train' phase
        (TrainState.train_start, stamped by the training loops and persisted
        in checkpoints), so the warm-up happens at the first adversarial
        steps regardless of how long the pretrain phases actually ran, and
        is reproducible across resumes."""
        h = self.hps
        rel = step.astype(jnp.float32) - jnp.maximum(train_start, 0).astype(jnp.float32)
        return h.alpha_enc * jnp.clip(rel / h.lat_sched_iters, 0.0, 1.0)

    def _stamp_train_start(self, state: TrainState, mode: str) -> TrainState:
        """Record where the 'train' phase begins (idempotent)."""
        if mode != "train":
            return state
        return state.replace(
            train_start=jnp.where(state.train_start < 0, state.step, state.train_start)
        )

    PAIR_SEP_MARGIN = 0.2  # min mean |z_t - z_{t+n/2}|: anti-collapse floor

    def _pair_consistency(self, z, z2, pair_dt):
        """Same-utterance pair objective (ref dataloader.py:~1-150 returns
        same-utterance segment pairs for stage-1; SURVEY.md §2 "Data loader",
        grade H on the pair's existence, the consumed objective itself is
        reconstructed — the reference mount was empty at survey time).

        Chosen form: unit consistency on the overlap + a separation hinge.
        The pair segment is offset by pair_dt frames, a multiple of
        hps.downsample, so the two latent sequences align exactly where the
        windows overlap; L1 between the aligned (straight-through) latents
        pushes the encoder toward stable, content-grounded units — the
        property the challenge's low-bitrate metric rewards.

        The ALIGNMENT term alone has a trivial optimum — temporally
        constant units score zero consistency and destroy content (observed:
        recon stalls, loss_pair ~ 1e-4) — so a hinge keeps latent frames
        half a segment apart (≈0.8 s of different content) at least
        PAIR_SEP_MARGIN apart in mean L1; the collapsed solution then costs
        the full margin and stops being optimal. Masked mean over the
        overlap (pairs with zero overlap contribute nothing)."""
        n = z.shape[1]
        d = pair_dt // self.hps.downsample  # [B] latent-frame offset
        t = jnp.arange(n)[None, :]
        ia = jnp.clip(t + jnp.maximum(d, 0)[:, None], 0, n - 1)
        ib = jnp.clip(t + jnp.maximum(-d, 0)[:, None], 0, n - 1)
        za = jnp.take_along_axis(z, ia[..., None], axis=1)
        zb = jnp.take_along_axis(z2, ib[..., None], axis=1)
        valid = (t < (n - jnp.abs(d))[:, None]).astype(z.dtype)  # [B, n]
        num = (jnp.abs(za - zb) * valid[..., None]).sum()
        l_align = num / (valid.sum() * z.shape[-1] + 1e-8)
        sep = jnp.abs(z[:, n // 2 :] - z[:, : n - n // 2]).mean()
        return l_align + jax.nn.relu(self.PAIR_SEP_MARGIN - sep)

    def _has_pair(self, batch) -> bool:
        """Static (trace-time) switch for the pair term."""
        return self.hps.lambda_pair > 0 and "x2" in batch and "pair_dt" in batch

    # ---------------------------------------------------------- stage 1

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def step_pretrain_ae(self, state: TrainState, batch):
        """pretrain_AE: reconstruction-only warmup of Encoder+Decoder
        (+ the same-utterance pair unit-consistency term when the batch
        carries the pair fields)."""
        x, spk = batch["x"], batch["spk"]
        h = self.hps
        rng, k = jax.random.split(state.rng)
        has_pair = self._has_pair(batch)

        def loss_fn(enc_params, dec_params):
            if has_pair:
                # encode x and its pair in ONE batched pass: the GRU scan is
                # serial in T, so 2B rides the MXU nearly free vs two scans
                zc = self._encode_latent(
                    enc_params, jnp.concatenate([x, batch["x2"]], 0), k, train=True
                )
                z, z2 = jnp.split(zc, 2, axis=0)
            else:
                z = self._encode_latent(enc_params, x, k, train=True)
            xh = self.decoder.apply(
                dec_params, z, spk, train=True, rngs={"dropout": jax.random.fold_in(k, 2)}
            )
            l_rec = jnp.abs(xh - x).mean()
            if not has_pair:
                return l_rec, (l_rec, 0.0)
            l_pair = self._pair_consistency(z, z2, batch["pair_dt"])
            return l_rec + h.lambda_pair * l_pair, (l_rec, l_pair)

        ((_, (l_rec, l_pair)), (g_enc, g_dec)) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.enc, state.dec)
        u_enc, opt_enc = self.tx.update(g_enc, state.opt_enc, state.enc)
        u_dec, opt_dec = self.tx.update(g_dec, state.opt_dec, state.dec)
        state = state.replace(
            step=state.step + 1,
            rng=rng,
            enc=optax.apply_updates(state.enc, u_enc),
            dec=optax.apply_updates(state.dec, u_dec),
            opt_enc=opt_enc,
            opt_dec=opt_dec,
        )
        metrics = {"loss_rec": l_rec}
        if has_pair:
            metrics["loss_pair"] = l_pair
        return state, metrics

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def step_pretrain_clf(self, state: TrainState, batch):
        """pretrain_C: train SpeakerClassifier on (frozen-encoder) latents."""
        x, spk = batch["x"], batch["spk"]
        rng, k = jax.random.split(state.rng)
        z = jax.lax.stop_gradient(self._encode_latent(state.enc, x, k, train=True))

        def loss_fn(clf_params):
            logits = self.classifier.apply(
                clf_params, z, train=True, rngs={"dropout": jax.random.fold_in(k, 3)}
            )
            return self.hps.alpha_dis * _ce(logits, spk), logits

        (l_clf, logits), g = jax.value_and_grad(loss_fn, has_aux=True)(state.clf)
        u, opt_clf = self.tx.update(g, state.opt_clf, state.clf)
        state = state.replace(
            step=state.step + 1,
            rng=rng,
            clf=optax.apply_updates(state.clf, u),
            opt_clf=opt_clf,
        )
        return state, {"loss_clf": l_clf, "acc_clf": _acc(logits, spk)}

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def step_train(self, state: TrainState, batch):
        """Stage-1 main phase: one fused XLA program doing
        (a) classifier update on current latents, then
        (b) adversarial AE update L_rec - alpha * L_clf (ref train mode:
        clf_step + encode/decode_step + adversarial encoder update)."""
        x, spk = batch["x"], batch["spk"]
        h = self.hps
        rng, k = jax.random.split(state.rng)
        alpha = self._alpha(state.step, state.train_start)
        has_pair = self._has_pair(batch)

        # (a) classifier step
        z_sg = jax.lax.stop_gradient(self._encode_latent(state.enc, x, k, train=True))

        def clf_loss(clf_params):
            logits = self.classifier.apply(
                clf_params, z_sg, train=True, rngs={"dropout": jax.random.fold_in(k, 3)}
            )
            return h.alpha_dis * _ce(logits, spk), logits

        (l_clf, clf_logits), g_clf = jax.value_and_grad(clf_loss, has_aux=True)(state.clf)
        u_clf, opt_clf = self.tx.update(g_clf, state.opt_clf, state.clf)
        clf_new = optax.apply_updates(state.clf, u_clf)

        # (b) adversarial AE step against the *updated* classifier
        def ae_loss(enc_params, dec_params):
            if has_pair:  # one batched encoder pass for x + its pair
                zc = self._encode_latent(
                    enc_params, jnp.concatenate([x, batch["x2"]], 0), k, train=True
                )
                z, z2 = jnp.split(zc, 2, axis=0)
            else:
                z = self._encode_latent(enc_params, x, k, train=True)
            xh = self.decoder.apply(
                dec_params, z, spk, train=True, rngs={"dropout": jax.random.fold_in(k, 2)}
            )
            l_rec = jnp.abs(xh - x).mean()
            adv_logits = self.classifier.apply(clf_new, z, train=False)
            l_adv = _ce(adv_logits, spk)  # encoder wants this LARGE
            loss = l_rec - alpha * l_adv
            l_pair = 0.0
            if has_pair:
                l_pair = self._pair_consistency(z, z2, batch["pair_dt"])
                loss = loss + h.lambda_pair * l_pair
            return loss, (l_rec, l_adv, l_pair)

        (_, (l_rec, l_adv, l_pair)), (g_enc, g_dec) = jax.value_and_grad(
            ae_loss, argnums=(0, 1), has_aux=True
        )(state.enc, state.dec)
        u_enc, opt_enc = self.tx.update(g_enc, state.opt_enc, state.enc)
        u_dec, opt_dec = self.tx.update(g_dec, state.opt_dec, state.dec)

        state = state.replace(
            step=state.step + 1,
            rng=rng,
            enc=optax.apply_updates(state.enc, u_enc),
            dec=optax.apply_updates(state.dec, u_dec),
            clf=clf_new,
            opt_enc=opt_enc,
            opt_dec=opt_dec,
            opt_clf=opt_clf,
        )
        metrics = {
            "loss_rec": l_rec,
            "loss_clf": l_clf,
            "loss_adv": l_adv,
            "acc_clf": _acc(clf_logits, spk),
            "alpha": alpha,
        }
        if has_pair:
            metrics["loss_pair"] = l_pair
        return state, metrics

    # ---------------------------------------------------------- stage 2

    def _generate(self, state, x_src, spk_tgt, k):
        z = self._encode_latent(state.enc, x_src, k, train=True)
        return self.decoder.apply(
            state.dec, z, spk_tgt, train=True, rngs={"dropout": jax.random.fold_in(k, 2)}
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def step_patch_d(self, state: TrainState, batch):
        """patch_step (ref): WGAN-GP critic update.

        batch: x_src (any speaker), x_real + spk_real (real segments of the
        speakers being imitated). Target speakers for fakes are sampled
        uniformly from the real-speaker labels (ref sample_c).
        """
        h = self.hps
        x_src, x_real, spk_real = batch["x"], batch["x_real"], batch["spk_real"]
        rng, k = jax.random.split(state.rng)
        spk_tgt = jax.random.choice(jax.random.fold_in(k, 4), spk_real, (x_src.shape[0],))
        x_fake = jax.lax.stop_gradient(self._generate(state, x_src, spk_tgt, k))

        def d_loss(dis_params):
            patch_real, cls_real = self.discriminator.apply(
                dis_params, x_real, train=True, rngs={"dropout": jax.random.fold_in(k, 5)}
            )
            patch_fake, _ = self.discriminator.apply(
                dis_params, x_fake, train=True, rngs={"dropout": jax.random.fold_in(k, 6)}
            )
            w_dist = patch_real.mean() - patch_fake.mean()

            # gradient penalty on interpolates (ref calculate_gradients_penalty)
            eps = jax.random.uniform(jax.random.fold_in(k, 7), (x_real.shape[0], 1, 1))
            x_hat = eps * x_real + (1.0 - eps) * x_fake

            def critic(xi):
                p, _ = self.discriminator.apply(dis_params, xi[None], train=False)
                return p.mean()

            g_int = jax.vmap(jax.grad(critic))(x_hat)
            gnorm = jnp.sqrt(jnp.sum(g_int**2, axis=(1, 2)) + 1e-12)
            gp = ((gnorm - 1.0) ** 2).mean()

            l_cls = _ce(cls_real, spk_real)
            loss = h.beta_dis * (-w_dist) + h.lambda_ * gp + h.beta_clf * l_cls
            return loss, (w_dist, gp, l_cls, cls_real)

        (l_d, (w_dist, gp, l_cls, cls_real)), g = jax.value_and_grad(d_loss, has_aux=True)(
            state.dis
        )
        u, opt_dis = self.tx.update(g, state.opt_dis, state.dis)
        state = state.replace(
            step=state.step + 1,
            rng=rng,
            dis=optax.apply_updates(state.dis, u),
            opt_dis=opt_dis,
        )
        return state, {
            "loss_d": l_d,
            "w_dist": w_dist,
            "grad_penalty": gp,
            "loss_d_cls": l_cls,
            "acc_d_cls": _acc(cls_real, spk_real),
        }

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def step_patch_g(self, state: TrainState, batch):
        """gen_step (ref): generator (decoder) update — fool the critic and
        land the auxiliary classifier on the sampled target speaker."""
        h = self.hps
        x_src, spk_real = batch["x"], batch["spk_real"]
        rng, k = jax.random.split(state.rng)
        spk_tgt = jax.random.choice(jax.random.fold_in(k, 4), spk_real, (x_src.shape[0],))

        def g_loss(dec_params):
            z = jax.lax.stop_gradient(self._encode_latent(state.enc, x_src, k, train=True))
            x_fake = self.decoder.apply(
                dec_params, z, spk_tgt, train=True, rngs={"dropout": jax.random.fold_in(k, 2)}
            )
            patch_fake, cls_fake = self.discriminator.apply(state.dis, x_fake, train=False)
            l_adv = -patch_fake.mean()
            l_cls = _ce(cls_fake, spk_tgt)
            loss = h.beta_gen * l_adv + h.beta_clf * l_cls
            if h.beta_rec > 0:
                # reconstruction anchor: same-speaker decode must still fit
                # the source (keeps the generator from drifting off-content)
                spk_src = batch["spk"]
                x_rec = self.decoder.apply(
                    dec_params, z, spk_src, train=True,
                    rngs={"dropout": jax.random.fold_in(k, 8)},
                )
                loss = loss + h.beta_rec * jnp.abs(x_rec - x_src).mean()
            return loss, (l_adv, l_cls)

        (l_g, (l_adv, l_cls)), g = jax.value_and_grad(g_loss, has_aux=True)(state.dec)
        u, opt_dec = self.tx.update(g, state.opt_dec, state.dec)
        state = state.replace(
            step=state.step + 1,
            rng=rng,
            dec=optax.apply_updates(state.dec, u),
            opt_dec=opt_dec,
        )
        return state, {"loss_g": l_g, "loss_g_adv": l_adv, "loss_g_cls": l_cls}

    # ------------------------------------------- multi-step device-data path

    def _step_body(self, mode: str):
        """The un-jitted single-step function for ``mode`` (the jitted
        wrappers carry a __wrapped__ attribute)."""
        return {
            "pretrain_AE": type(self).step_pretrain_ae,
            "pretrain_C": type(self).step_pretrain_clf,
            "train": type(self).step_train,
        }[mode].__wrapped__

    @functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7), donate_argnums=1)
    def train_many(
        self,
        state: TrainState,
        dataset,
        mode: str,
        k_steps: int,
        batch_sharding=None,
        pairs: bool = True,
        metrics_reduce: str = "last",
    ):
        """Run k_steps of ``mode`` in ONE dispatch: a lax.scan whose body
        samples the batch from the device-resident dataset and applies the
        un-jitted step. Zero host traffic per step — the TPU-native answer
        to the reference's per-batch DataLoader loop. Returns the state and
        the LAST step's metrics (``metrics_reduce="mean"`` averages them
        over the whole dispatch instead — a single-step sample of a noisy
        scalar like the critic's W-distance estimate is a poor trend
        signal; the mean over the chunk is the statistic A/B tools should
        plot).

        For mode='patchGAN' each scan iteration is one full GAN cycle
        (n_critic D steps + 1 G step), counting as n_critic+1 solver steps.

        batch_sharding: optional (hashable) NamedSharding constraining the
        sampled batch over the mesh 'data' axis — the DP path for
        device-resident training.
        """

        state = self._stamp_train_start(state, mode)
        want_pairs = pairs and mode in ("pretrain_AE", "train") and self.hps.lambda_pair > 0
        # protocol, not signature-sniffing: datasets that implement the pair
        # fields declare supports_pairs = True (DeviceDataset and
        # ShardedDeviceDataset both do); anything else is called plain
        takes_pairs = getattr(dataset, "supports_pairs", False)

        def sample(k):
            b = (
                dataset.sample_batch(k, pairs=want_pairs)
                if takes_pairs
                else dataset.sample_batch(k)
            )
            if batch_sharding is not None:
                b = jax.lax.with_sharding_constraint(
                    b, jax.tree.map(lambda _: batch_sharding, b)
                )
            return b

        if mode == "patchGAN":

            def body(st, _):
                def d_once(st, _):
                    k = jax.random.fold_in(st.rng, 17)
                    st2, m = type(self).step_patch_d.__wrapped__(self, st, sample(k))
                    return st2, m

                st, md = jax.lax.scan(d_once, st, None, length=self.hps.n_critic)
                k = jax.random.fold_in(st.rng, 19)
                st, mg = type(self).step_patch_g.__wrapped__(self, st, sample(k))
                return st, {**jax.tree.map(lambda x: x[-1], md), **mg}

        else:
            step = self._step_body(mode)

            def body(st, _):
                k = jax.random.fold_in(st.rng, 17)
                return step(self, st, sample(k))

        state, metrics = jax.lax.scan(body, state, None, length=k_steps)
        if metrics_reduce == "mean":
            return state, jax.tree.map(lambda x: x.mean(axis=0), metrics)
        return state, jax.tree.map(lambda x: x[-1], metrics)

    def train_device(
        self,
        state: TrainState,
        dataset,
        mode: str,
        iters: int,
        logger=None,
        ckpt=None,
        log_interval: int | None = None,
        save_interval: int | None = None,
        batch_sharding=None,
        pairs: bool = True,
    ) -> TrainState:
        """Training loop over the device-resident dataset: chunks of
        log_interval steps per dispatch, logging/checkpointing at chunk
        boundaries."""
        h = self.hps
        log_interval = log_interval or h.log_interval
        save_interval = save_interval or h.save_interval
        state = self._stamp_train_start(state, mode)
        done = 0
        next_save = save_interval
        while done < iters:
            k = min(log_interval, iters - done)
            state, metrics = self.train_many(state, dataset, mode, k, batch_sharding, pairs)
            done += k
            if logger:
                logger.log(int(state.step), metrics, prefix=mode)
            if ckpt and done >= next_save:
                ckpt.save(state)
                next_save += save_interval
        return state

    # -------------------------------------------------------- orchestration

    MODES = ("pretrain_AE", "pretrain_C", "train", "patchGAN")

    def step_fn(self, mode: str) -> Callable:
        return {
            "pretrain_AE": self.step_pretrain_ae,
            "pretrain_C": self.step_pretrain_clf,
            "train": self.step_train,
        }[mode]

    def train(
        self,
        state: TrainState,
        data_iter,
        mode: str,
        iters: int,
        logger=None,
        ckpt=None,
        log_interval: int | None = None,
        save_interval: int | None = None,
    ) -> TrainState:
        """Training loop for one phase (ref Solver.train). ``data_iter``
        yields batch dicts; stage-2 alternates n_critic D steps per G step."""
        h = self.hps
        log_interval = log_interval or h.log_interval
        save_interval = save_interval or h.save_interval

        if mode == "patchGAN":
            for i in range(iters):
                for _ in range(h.n_critic):
                    state, m_d = self.step_patch_d(state, next(data_iter))
                state, m_g = self.step_patch_g(state, next(data_iter))
                if logger and (i + 1) % log_interval == 0:
                    logger.log(int(state.step), {**m_d, **m_g}, prefix=mode)
                if ckpt and (i + 1) % save_interval == 0:
                    ckpt.save(state)
            return state

        state = self._stamp_train_start(state, mode)
        step = self.step_fn(mode)
        for i in range(iters):
            state, metrics = step(state, next(data_iter))
            if logger and (i + 1) % log_interval == 0:
                logger.log(int(state.step), metrics, prefix=mode)
            if ckpt and (i + 1) % save_interval == 0:
                ckpt.save(state)
        return state
