"""Perceptual and GAN loss modules (Flax) + hinge-loss functions.

TPU-native equivalents of `/root/reference/genie/module/loss.py`. Both
losses sample a random per-video frame subset through explicit PRNG keys
(the reference draws from torch's global RNG, `loss.py:81-87,137-141`).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from open_genie_tpu.modules.discriminator import (
    FrameDiscriminator,
    VideoDiscriminator,
)
from open_genie_tpu.modules.vgg import VGG16Features
from open_genie_tpu.utils import pick_frames, random_frame_idxs


class PerceptualLoss(nn.Module):
    """Frozen-VGG16 feature MSE on a shared random frame subset per video.

    Matches `loss.py:34-103`: the *same* frame indices are used for the
    reconstructed and the real video; the loss is the mean over tap layers
    of the MSE between flattened activations. The VGG parameters live in
    this module's variables; the train loop masks them out of the optimizer
    (frozen) and may overwrite them with converted torchvision weights.
    """

    model_name: str = "vgg16"
    feat_layers: Tuple[str, ...] = (
        "features.6", "features.13", "features.18", "features.25",
    )
    num_frames: int = 4

    @nn.compact
    def __call__(
        self,
        rec_video: jnp.ndarray,
        inp_video: jnp.ndarray,
        key: jax.Array,
    ) -> jnp.ndarray:
        assert self.model_name == "vgg16", (
            f"Only vgg16 is provided ({self.model_name} requested); the "
            "reference defaults to vgg16 as well."
        )
        b, t = inp_video.shape[:2]
        k = min(self.num_frames, t)
        idxs = random_frame_idxs(key, b, t, k)
        fake = pick_frames(rec_video, idxs)
        real = pick_frames(inp_video, idxs)

        vgg = VGG16Features(feat_layers=tuple(self.feat_layers), name="vgg")
        fake_feat = vgg(fake)
        real_feat = jax.lax.stop_gradient(vgg(real))

        losses = [
            jnp.mean((fake_feat[name] - real_feat[name]) ** 2)
            for name in self.feat_layers
        ]
        return jnp.stack(losses).mean()


class GANLoss(nn.Module):
    """Hinge GAN loss wrapping a frame or video discriminator.

    Matches `loss.py:109-163`:
      generator:     `-E[D(fake)]`            (gradients flow into fake)
      discriminator: `E[relu(1 + D(sg(fake)))] + E[relu(1 - D(real))]`

    `train_gen` selects the branch; the reference's single-optimizer trick
    (summing both branches, `tokenizer.py:367-379`) works because the
    discriminator branch stops gradients into the generator and the
    generator branch contains no real-path discriminator gradients pulling
    the opposite way -- the train loop exposes alternating optimization as a
    config switch as well.
    """

    discriminate: str = "frames"
    num_frames: int = 4
    disc_kwargs: Optional[dict] = None

    def setup(self):
        assert self.discriminate in ("frames", "video"), (
            'Invalid discriminator type. Must be either "frames" or "video".'
        )
        kwargs = dict(self.disc_kwargs or {})
        kwargs = {
            k: tuple(v) if isinstance(v, list) else v for k, v in kwargs.items()
        }
        if self.discriminate == "frames":
            kwargs.setdefault("inp_size", (64, 64))
            self.disc = FrameDiscriminator(**kwargs)
        else:
            kwargs.setdefault("inp_size", (16, 64, 64))
            self.disc = VideoDiscriminator(**kwargs)

    def examples(self, rec_video, inp_video, key):
        if self.discriminate == "video":
            return rec_video, inp_video
        b, t = inp_video.shape[:2]
        k = min(self.num_frames, t)
        idxs = random_frame_idxs(key, b, t, k)
        return pick_frames(rec_video, idxs), pick_frames(inp_video, idxs)

    def __call__(
        self,
        rec_video: jnp.ndarray,
        inp_video: jnp.ndarray,
        key: jax.Array,
        train_gen: bool,
        train: bool = False,
    ) -> jnp.ndarray:
        fake, real = self.examples(rec_video, inp_video, key)
        if train_gen:
            # Same theta_D-cancelling form as `both()`: the naive
            # `-D(fake).mean()` also has nonzero gradient w.r.t. D's
            # params, so under an all-params optimizer every "generator"
            # step would push D to inflate fake scores (the runaway the
            # `both` docstring describes). Value is still -mean(D(fake)).
            d_fs = self.disc(jax.lax.stop_gradient(fake), train=train)
            d_f = self.disc(fake, train=train)
            return -(d_f - d_fs + jax.lax.stop_gradient(d_fs)).mean()
        fake_score = self.disc(jax.lax.stop_gradient(fake), train=train)
        real_score = self.disc(real, train=train)
        return (
            nn.relu(1.0 + fake_score) + nn.relu(1.0 - real_score)
        ).mean()

    def both(
        self,
        rec_video: jnp.ndarray,
        inp_video: jnp.ndarray,
        key: jax.Array,
        train: bool = False,
    ):
        """Generator + discriminator hinge losses with EXACT gradient
        separation under a single optimizer.

        The reference sums `-E[D(fake)]` and the hinge into one total
        (`tokenizer.py:367-379`); under one backward pass the generator term
        also pushes the *discriminator's* params to inflate fake scores --
        the two terms then cancel to a constant while their magnitudes run
        away (observed: gen -> -1e4, dis -> +1e4, reconstruction destroyed).

        Here the generator term is
            gen = -mean(d_f - d_fs + sg(d_fs)),
            d_f = D(fake), d_fs = D(sg(fake))
        whose value is `-mean(D(fake))`, whose gradient w.r.t. D's params is
        exactly zero (the two theta-paths cancel), and whose gradient w.r.t.
        `fake` is the true generator gradient. `d_fs` is shared with the
        discriminator hinge, so this costs one extra D forward, no extra
        backward.
        """
        fake, real = self.examples(rec_video, inp_video, key)
        d_fs = self.disc(jax.lax.stop_gradient(fake), train=train)
        d_f = self.disc(fake, train=train)
        d_r = self.disc(real, train=train)

        gen_loss = -(d_f - d_fs + jax.lax.stop_gradient(d_fs)).mean()
        dis_loss = (nn.relu(1.0 + d_fs) + nn.relu(1.0 - d_r)).mean()
        return gen_loss, dis_loss
