"""Training-objective modules: full tokenizer loss stack, Genie joint loss.

This layer separates "model" from "training objective" (the reference
conflates both in LightningModules, `genie/tokenizer.py:225`,
`genie/genie.py:18`). Each train module is a Flax module whose parameters
include the model AND any loss-owned parameters (discriminator, frozen VGG);
the optimizer masks control what actually trains.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from open_genie_tpu.models.genie import Genie
from open_genie_tpu.models.tokenizer import VideoTokenizer
from open_genie_tpu.modules.loss import GANLoss, PerceptualLoss


class TokenizerTrainModule(nn.Module):
    """VideoTokenizer + reconstruction/GAN/perceptual/quantization loss.

    Mirrors the reference loss assembly (`tokenizer.py:352-387`) with its
    precedence bug fixed: every term is always weighted into the total (the
    reference's trailing ternary silently drops the whole sum when
    `quant_loss is None`, `tokenizer.py:375-379`).

    The reference's single-optimizer GAN trick (generator and discriminator
    losses summed into one total, gradient separation via stop-gradient on
    the fake path) is the default; `train/loop.py` offers alternating
    optimization as a config switch.
    """

    tokenizer: Dict[str, Any]
    disc_kwargs: Optional[Dict[str, Any]] = None
    perceptual_model: str = "vgg16"
    perc_feat_layers: Tuple[str, ...] = (
        "features.6", "features.13", "features.18", "features.25",
    )
    gan_discriminate: str = "frames"
    gan_frames_per_batch: int = 4
    gan_loss_weight: float = 1.0
    perc_loss_weight: float = 1.0
    quant_loss_weight: float = 1.0

    def setup(self):
        self.model = VideoTokenizer(**self.tokenizer)
        if self.perc_loss_weight > 0:
            self.perc_crit = PerceptualLoss(
                model_name=self.perceptual_model,
                feat_layers=tuple(self.perc_feat_layers),
                num_frames=self.gan_frames_per_batch,
            )
        if self.gan_loss_weight > 0:
            self.gan_crit = GANLoss(
                discriminate=self.gan_discriminate,
                num_frames=self.gan_frames_per_batch,
                disc_kwargs=self.disc_kwargs,
            )

    def __call__(
        self,
        video: jnp.ndarray,
        key: jax.Array,
        beta: float = 100.0,
        train: bool = True,
        gan_branch: str = "both",
        entropy_scale=1.0,
        bit_balance_scale=1.0,
    ) -> Tuple[jnp.ndarray, dict]:
        """Full training loss on `(B, T, H, W, C)` video in [0, 1].

        `gan_branch` in {'both', 'gen', 'dis'} supports alternating GAN
        optimization; 'both' replicates the reference's summed objective.
        `entropy_scale` (traced scalar ok) multiplies the LFQ entropy
        objective -- the anneal lever (`ops/lfq.py::lfq_loss`).
        """
        k_perc, k_gan = jax.random.split(key)

        rec, out = self.model(
            video, beta=beta, train=train, entropy_scale=entropy_scale,
            bit_balance_scale=bit_balance_scale,
        )
        quant_loss = out["quant_loss"]

        rec_loss = jnp.mean((rec - video) ** 2)
        zero = jnp.zeros((), jnp.float32)

        gen_loss = dis_loss = zero
        if self.gan_loss_weight > 0:
            if gan_branch == "both":
                # Single-optimizer objective with exact G/D gradient
                # separation (see GANLoss.both).
                gen_loss, dis_loss = self.gan_crit.both(
                    rec, video, k_gan, train=train
                )
            elif gan_branch == "gen":
                gen_loss = self.gan_crit(rec, video, k_gan, train_gen=True, train=train)
            elif gan_branch == "dis":
                dis_loss = self.gan_crit(rec, video, k_gan, train_gen=False, train=train)

        perc_loss = zero
        if self.perc_loss_weight > 0:
            perc_loss = self.perc_crit(rec, video, k_perc)

        loss = (
            rec_loss
            + gen_loss * self.gan_loss_weight
            + dis_loss * self.gan_loss_weight
            + perc_loss * self.perc_loss_weight
            + (quant_loss if quant_loss is not None else zero)
            * self.quant_loss_weight
        )

        metrics = {
            "loss": loss,
            "rec_loss": rec_loss,
            "gen_loss": gen_loss,
            "dis_loss": dis_loss,
            "perc_loss": perc_loss,
            "quant_loss": quant_loss if quant_loss is not None else zero,
            **{f"lfq_{k}": v for k, v in out["lfq_aux"].items()},
        }
        return loss, metrics

    # Inference passthroughs (used by eval / bench via method= dispatch).
    def tokenize(self, video, beta: float = 100.0):
        return self.model.tokenize(video, beta=beta)

    def reconstruct(self, video, beta: float = 100.0):
        rec, out = self.model(video, beta=beta, train=False)
        return rec, out["idxs"]

    def decode_tokens(self, idxs):
        return self.model.decode_tokens(idxs)


class GenieTrainModule(nn.Module):
    """Genie joint training objective (frozen tokenizer inside)."""

    genie: Dict[str, Any]

    def setup(self):
        self.model = Genie(**self.genie)

    def __call__(self, video, key, train: bool = True):
        return self.model.compute_loss(video, key, training=train)

    def full_init(self, video, key, train: bool = True):
        """Init-only: touch every param incl. the tokenizer pixel decoder."""
        return self.model.init_full(video, key)

    def generate(self, prompt, actions, key, num_frames: int = 16,
                 steps_per_frame: int = 25, temp: float = 1.0, top_k=None):
        return self.model(
            prompt, actions, key,
            num_frames=num_frames, steps_per_frame=steps_per_frame, temp=temp,
            top_k=top_k,
        )


class ActionTrainModule(nn.Module):
    """Standalone LatentAction VQ-VAE pre-training objective.

    The reference defines this objective (`LatentAction.forward`,
    `/root/reference/genie/action.py:151-176`: pixel-reconstruction MSE +
    weighted LFQ loss over the tiny action codebook) but has no entry
    point for training it alone; `cli train action` drives this module.
    A pre-trained action model warm-starts joint Genie training via
    `model.action_ckpt`.
    """

    latent_action: Dict[str, Any]

    def setup(self):
        from open_genie_tpu.models.action import LatentAction

        self.model = LatentAction(**self.latent_action)

    def __call__(self, video, key, train: bool = True):
        idxs, loss, aux = self.model(video, training=train)
        # 'loss' must be present in VAL metrics too (best-ckpt monitor).
        return loss, {"loss": loss,
                      **{f"act_{k}": v for k, v in aux.items()}}


class DynamicsTrainModule(nn.Module):
    """Dynamics-only training over pre-tokenized clips.

    The staged-training fast path: with the tokenizer and latent-action
    models frozen and their outputs cached to disk (`cli.py tokenize-data`,
    `data/tokens.py`), dynamics training consumes
    `{"tokens": (B, T', H', W'), "actions": (B, T')}` batches directly --
    no tokenizer/action forwards in the step, an order of magnitude less
    host IO, and the masked-CE objective identical to the joint path
    (`DynamicsModel.compute_loss`).
    """

    dynamics: Dict[str, Any]

    def setup(self):
        from open_genie_tpu.models.dynamics import DynamicsModel

        self.model = DynamicsModel(**self.dynamics)

    def __call__(self, batch, key, train: bool = True):
        loss, aux = self.model.compute_loss(
            batch["tokens"], batch["actions"], key, train=train
        )
        # 'loss' must be present in VAL metrics too: the loop's best-
        # checkpoint monitor defaults to val_loss (train metrics get it
        # injected by make_train_step, validation does not).
        return loss, {"loss": loss, "dyn_loss": loss,
                      **{f"dyn_{k}": v for k, v in aux.items()}}


def frozen_param_mask(params, frozen_prefixes: Tuple[str, ...]):
    """Optax mask pytree: True = trainable, False = frozen.

    `frozen_prefixes` are `/`-joined path-SEGMENT sequences, e.g.
    `('perc_crit',)` to freeze the VGG, `('model/tokenizer_',)` to freeze
    the tokenizer inside Genie. A prefix matches where its segments appear
    consecutively and exactly in a param's path -- anchored on segment
    boundaries, so `('head',)` cannot over-freeze an unrelated
    `action_head` (the old substring test could).
    """
    import flax

    def matches(path: Tuple[str, ...], prefix: str) -> bool:
        want = tuple(seg for seg in prefix.split("/") if seg)
        if not want:
            return False
        n = len(want)
        return any(
            path[i : i + n] == want for i in range(len(path) - n + 1)
        )

    flat = flax.traverse_util.flatten_dict(params)
    mask = {
        k: not any(matches(k, p) for p in frozen_prefixes) for k in flat
    }
    return flax.traverse_util.unflatten_dict(mask)
