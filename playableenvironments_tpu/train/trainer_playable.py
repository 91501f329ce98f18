"""Phase-3 trainer: the action module over frozen scene encodings.

Replaces training/playable_model_trainer.py (+_discriminator): state
reconstruction (rotations compared in (sin, cos) space), action-direction KL,
EMA-smoothed action mutual information, optional entropy and ACMV, and the
optional GAN (generator + discriminator alternating steps). All EMA state
(per-object action centroids, per-object MI matrices) lives in
TrainState.extra and is threaded through the loss.

Two annealing schedules (playable_model_trainer.py:146-174, 537-561) are
host-side: sequence length drives the dataset re-indexing
(MulticameraVideoDataset.set_observations_count), teacher-forcing count is a
traced scalar input to the jitted step — neither forces recompilation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import functools

import jax
import jax.numpy as jnp

from playableenvironments_tpu.config import ObjectIds, SceneConfig
from playableenvironments_tpu.data.batching import Batch
from playableenvironments_tpu.models.action import init_centroids
from playableenvironments_tpu.models.layers import encode_rotation
from playableenvironments_tpu.render.environment_model import EnvironmentModel
from playableenvironments_tpu.render.playable_model import PlayableEnvironmentModel
from playableenvironments_tpu.scene.encoding import SceneEncoding
from playableenvironments_tpu.train import losses
from playableenvironments_tpu.train.state import TrainState, create_train_state, make_optimizer
from playableenvironments_tpu.train.trainer_synthesis import split_rngs


@dataclass(frozen=True)
class PlayableLossWeights:
    """configs/*/playability yaml `playable_model_training.loss_weights`."""

    rotations_rec: float = 1.0
    translations_rec: float = 1.0
    style_rec: float = 1.0
    deformation_rec: float = 1.0
    entropy: float = 0.0
    action_directions_kl: float = 1e-4
    action_mutual_information: float = 0.15
    acmv: float = 0.0
    gan: float = 0.0


@dataclass(frozen=True)
class PlayableTrainingConfig:
    learning_rate: float = 5e-4
    lr_gamma: float = 0.926118
    lr_decay_iterations: int = 10000
    weight_decay: float = 0.0
    max_steps: int = 300000
    # Teacher forcing annealing (ground_truth_observations_start/end/steps).
    ground_truth_observations_start: int = 6
    ground_truth_observations_end: int = 6
    ground_truth_observations_steps: int = 16000
    # Sequence length annealing (batching.observations_count_*), applied by the
    # training loop to the dataset.
    observations_count: int = 9
    observations_count_start: int = 7
    observations_count_steps: int = 25000
    mutual_information_alpha: float = 0.2
    mutual_information_entropy_lambda: float = 1.0
    gan_mode: str = "lsgan"
    # Adam (b1, b2); the published playability experiments use (0.5, 0.999)
    # (reference playable_model_trainer.py:93, playability yamls `betas`).
    betas: Tuple[float, float] = (0.9, 0.999)
    # Discriminator optimizer overrides (reference
    # playable_model_trainer_discriminator.py:43-45); None = the main values.
    discriminator_learning_rate: Optional[float] = None
    discriminator_weight_decay: Optional[float] = None
    # Camera-relative ACMV (playable_model_trainer.py:234-263, 418-439):
    # movements rotated into the camera frame (about the ground-normal axis)
    # before the variance ratio.
    use_camera_relative_acmv: bool = False
    acmv_rotation_axis: Optional[int] = None
    loss_weights: PlayableLossWeights = field(default_factory=PlayableLossWeights)

    def ground_truth_observations_at(self, step) -> jnp.ndarray:
        """Linear annealing of the teacher-forced step count."""
        start, end = (
            self.ground_truth_observations_start,
            self.ground_truth_observations_end,
        )
        fraction = jnp.clip(step / self.ground_truth_observations_steps, 0.0, 1.0)
        return jnp.round(start + (end - start) * fraction).astype(jnp.int32)

    def observations_count_at(self, step: int) -> int:
        """Annealed sequence length (host-side; drives dataset re-indexing)."""
        fraction = min(max(step / self.observations_count_steps, 0.0), 1.0)
        return int(
            round(
                self.observations_count_start
                + (self.observations_count - self.observations_count_start) * fraction
            )
        )


def masked_mse(a: jnp.ndarray, b: jnp.ndarray, validity: jnp.ndarray) -> jnp.ndarray:
    """MSE over entries whose (truncated-to-length) validity is True."""
    v = validity[:, : a.shape[1]]
    extra = a.ndim - v.ndim
    return losses.masked_mean(jnp.square(a - b), v.reshape(v.shape + (1,) * extra))


class PlayableTrainer:
    """Jitted phase-3 train step. The environment model is frozen: its
    parameters sit in the state but only the playable subtree receives
    gradients (reference freezes via requires_grad, playable_environment_model
    .py:26-28)."""

    def __init__(
        self,
        environment_model: EnvironmentModel,
        playable_model: PlayableEnvironmentModel,
        cfg: PlayableTrainingConfig,
    ):
        self.environment_model = environment_model
        self.playable_model = playable_model
        self.cfg = cfg
        self.object_ids = ObjectIds(environment_model.scene)
        self.tx_disc = None  # set by init_state when the GAN is enabled

    # ------------------------------------------------------------------

    def init_state(
        self,
        key: jax.Array,
        example_batch: Batch,
        environment_params,
        environment_batch_stats,
    ) -> Tuple[TrainState, TrainState]:
        """Returns (playable_state, frozen environment variables as extra).

        The playable state's extra carries per-object centroids and MI
        matrices plus the frozen env variables (checkpointed together, the
        cross-phase transfer contract of README.md:144-155).
        """
        encoding = self._scene_encoding(
            environment_params, environment_batch_stats, example_batch, key
        )
        return self.init_state_from_encoding(
            key, encoding, environment_params, environment_batch_stats
        )

    def init_state_from_encoding(
        self,
        key: jax.Array,
        encoding: SceneEncoding,
        environment_params,
        environment_batch_stats,
    ) -> TrainState:
        """init_state when an encoding is already at hand (cache/bench paths —
        the playable subtree never needs raw images)."""
        # The dynamics rollout only traces with >= 2 observations; pad the
        # init encoding so every parameter exists even when the example batch
        # is a single frame (e.g. the play CLI's T=1 batches).
        if encoding.object_rotations.shape[1] < 2:
            encoding = jax.tree.map(
                lambda x: jnp.concatenate([x, x], axis=1), encoding
            )
        rngs = {
            "params": key,
            "action_sampling": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2),
        }
        centroids = [
            init_centroids(
                jax.random.fold_in(key, i),
                cfg.actions_count,
                cfg.action_space_dimension,
            )
            for i, cfg in enumerate(self.scene_animation_configs())
        ]
        gt0 = jnp.asarray(self.cfg.ground_truth_observations_start, jnp.int32)
        variables = jax.jit(
            functools.partial(
                self.playable_model.init,
                method=PlayableEnvironmentModel.animate,
            )
        )(rngs, encoding, gt0, self._per_object_centroids(centroids))
        if self.playable_model.with_discriminators:
            def _disc_init(r, v, enc, g, cents):
                animated, _ = self.playable_model.apply(
                    v, enc, g, cents,
                    method=PlayableEnvironmentModel.animate, rngs=r,
                    mutable=["batch_stats"],
                )
                return self.playable_model.init(
                    r, animated, enc, False,
                    method=PlayableEnvironmentModel.discriminate,
                )

            disc_variables = jax.jit(_disc_init)(
                rngs, variables, encoding, gt0,
                self._per_object_centroids(centroids),
            )
            # Merge discriminator params into the same tree.
            variables = jax.tree_util.tree_map(
                lambda x: x, variables
            )
            merged = dict(variables)
            merged_params = dict(variables["params"])
            merged_params.update(disc_variables["params"])
            merged["params"] = merged_params
            for collection in disc_variables:
                if collection not in ("params",):
                    extra_coll = dict(merged.get(collection, {}))
                    extra_coll.update(disc_variables[collection])
                    merged[collection] = extra_coll
            variables = merged

        # Two optimizers, like the reference's alternated G/D Adam pair
        # (playable_model_trainer_discriminator.py:195-234): the main tx
        # steps non-discriminator params, the discriminator tx the
        # discriminator subtree (its opt state rides in extra). Each tx must
        # also ZERO the other group's updates: optax.masked passes
        # masked-out leaves through UNCHANGED, i.e. the raw gradient —
        # the generator's adversarial loss has nonzero grads w.r.t. the
        # discriminator (no stop_gradient there), which would otherwise be
        # added to the discriminator verbatim (unscaled, bypassing its Adam)
        # on every generator pass.
        import optax

        def _mask(params, want_discriminator: bool):
            return {
                k: jax.tree.map(
                    lambda _: k.startswith("discriminator") == want_discriminator, v
                )
                for k, v in params.items()
            }

        base_tx = make_optimizer(
            self.cfg.learning_rate,
            self.cfg.lr_gamma,
            self.cfg.lr_decay_iterations,
            self.cfg.weight_decay,
            betas=tuple(self.cfg.betas),
        )
        if self.playable_model.with_discriminators:
            tx = optax.chain(
                optax.masked(base_tx, lambda p: _mask(p, False)),
                optax.masked(optax.set_to_zero(), lambda p: _mask(p, True)),
            )
            disc_lr = (
                self.cfg.discriminator_learning_rate
                if self.cfg.discriminator_learning_rate is not None
                else self.cfg.learning_rate
            )
            disc_wd = (
                self.cfg.discriminator_weight_decay
                if self.cfg.discriminator_weight_decay is not None
                else self.cfg.weight_decay
            )
            self.tx_disc = optax.chain(
                optax.masked(
                    make_optimizer(
                        disc_lr,
                        self.cfg.lr_gamma,
                        self.cfg.lr_decay_iterations,
                        disc_wd,
                        betas=tuple(self.cfg.betas),
                    ),
                    lambda p: _mask(p, True),
                ),
                optax.masked(optax.set_to_zero(), lambda p: _mask(p, False)),
            )
        else:
            tx = base_tx
            self.tx_disc = None
        extra = {
            "centroids": {str(i): c for i, c in enumerate(centroids)},
            "mi_matrices": {
                str(i): jnp.full(
                    (cfg.actions_count, cfg.actions_count),
                    1.0 / cfg.actions_count ** 2,
                )
                for i, cfg in enumerate(self.scene_animation_configs())
            },
            "environment": {
                "params": environment_params,
                "batch_stats": environment_batch_stats,
            },
        }
        if self.tx_disc is not None:
            extra["disc_opt_state"] = self.tx_disc.init(variables["params"])
        other = {
            k: v for k, v in variables.items() if k not in ("params",)
        }
        return create_train_state(
            variables["params"], other.get("batch_stats", {}), tx, extra=extra
        )

    def scene_animation_configs(self):
        return self.environment_model.scene.animation_models

    def _per_object_centroids(self, centroids_by_model):
        """Map per-animation-model centroids onto the per-dynamic-object list."""
        out = []
        for dynamic_idx in range(self.object_ids.dynamic_objects_count):
            anim_idx = self.object_ids.animation_model_idx_by_dynamic_object_idx(
                dynamic_idx
            )
            out.append(centroids_by_model[anim_idx])
        return out

    # ------------------------------------------------------------------

    def _scene_encoding(
        self, env_params, env_batch_stats, batch: Batch, key: jax.Array
    ) -> SceneEncoding:
        """Frozen scene encoding (eval mode, stop-gradient): the phase-3
        equivalent of `with no_grad(): env_model(...encoding_only)`
        (playable_environment_model.py:173-175)."""
        (encoding, _), _ = self.environment_model.apply(
            {"params": env_params, "batch_stats": env_batch_stats},
            *batch.environment_model_args(),
            shuffle_style=False,
            train=False,
            method=EnvironmentModel.compute_scene_encoding,
            rngs=split_rngs(key),
            mutable=["batch_stats"],
        )
        return jax.lax.stop_gradient(encoding)

    def compute_losses(
        self,
        params,
        batch_stats,
        extra: Dict,
        encoding: SceneEncoding,
        key: jax.Array,
        step: jnp.ndarray,
        generator_pass: bool = True,
    ):
        """(loss, (metrics, new_batch_stats, new_extra, results, encoding)).

        Takes the FROZEN scene encoding directly: it is deterministic in eval
        mode, so the trainer computes it once per batch (or reads it from the
        precomputed cache) and shares it between the generator and
        discriminator passes instead of re-running the conv encoders inside
        every loss (the round-1 1.6 s/step bug)."""
        w = self.cfg.loss_weights
        _, key_anim, key_gumbel = jax.random.split(key, 3)

        centroids = self._per_object_centroids(
            [extra["centroids"][str(i)] for i in range(len(self.scene_animation_configs()))]
        )
        gt_count = self.cfg.ground_truth_observations_at(step)

        variables = {"params": params, "batch_stats": batch_stats}
        results, mutated = self.playable_model.apply(
            variables,
            encoding,
            gt_count,
            centroids,
            None,
            False,
            method=PlayableEnvironmentModel.animate,
            rngs={"action_sampling": key_anim, "gumbel": key_gumbel},
            mutable=["batch_stats"],
        )

        metrics: Dict[str, jnp.ndarray] = {}
        total = jnp.zeros(())
        new_extra = dict(extra)  # preserves environment/disc_opt_state leaves
        new_extra["centroids"] = dict(extra["centroids"])
        new_extra["mi_matrices"] = dict(extra["mi_matrices"])

        use_gan = (
            self.playable_model.with_discriminators and generator_pass and w.gan > 0.0
        )
        if use_gan:
            # Score every object's fake sequence in one call so each result
            # reaches ITS object's discriminator (per-object mapping breaks if
            # scored one at a time from a singleton list).
            fake_logits_per_object = self.playable_model.apply(
                variables, results, encoding, True, False,
                method=PlayableEnvironmentModel.discriminate,
            )

        for dynamic_idx, res in enumerate(results):
            object_idx = self.object_ids.object_idx_by_dynamic_object_idx(dynamic_idx)
            anim_idx = self.object_ids.animation_model_idx_by_dynamic_object_idx(
                dynamic_idx
            )
            prefix = f"object_{object_idx}_"
            validity = res["sequence_validity"]

            rot_rec = masked_mse(
                encode_rotation(res["reconstructed_object_rotations"]),
                encode_rotation(encoding.object_rotations[..., object_idx, :]),
                validity,
            )
            trans_rec = masked_mse(
                res["reconstructed_object_translations"],
                encoding.object_translations[..., object_idx, :],
                validity,
            )
            style_rec = masked_mse(
                res["reconstructed_object_style"],
                encoding.object_style[..., object_idx, :],
                validity,
            )
            deform_rec = masked_mse(
                res["reconstructed_object_deformation"],
                encoding.object_deformation[..., object_idx, :],
                validity,
            )

            entropy = losses.entropy_logits(res["action_logits"])
            directions_kl = losses.kl_gaussian(res["action_directions_distribution"])

            mi_matrix = extra["mi_matrices"][str(anim_idx)]
            mi_loss, new_mi = losses.mutual_information_loss(
                jax.nn.softmax(res["action_logits"], axis=-1),
                jax.nn.softmax(res["reconstructed_action_logits"], axis=-1),
                lamb=self.cfg.mutual_information_entropy_lambda,
                smoothing_matrix=mi_matrix,
                smoothing_alpha=self.cfg.mutual_information_alpha,
            )
            new_extra["mi_matrices"][str(anim_idx)] = new_mi
            new_extra["centroids"][str(anim_idx)] = res["estimated_action_centroids"]

            object_loss = (
                w.rotations_rec * rot_rec
                + w.translations_rec * trans_rec
                + w.style_rec * style_rec
                + w.deformation_rec * deform_rec
                + w.entropy * entropy
                + w.action_directions_kl * directions_kl
                + w.action_mutual_information * mi_loss
            )

            if w.acmv > 0.0:
                translations = encoding.object_translations[..., object_idx, :]
                movements = translations[:, 1:] - translations[:, :-1]
                if self.cfg.use_camera_relative_acmv:
                    movements = losses.camera_relative_movements(
                        movements,
                        encoding.camera_rotations,
                        self.cfg.acmv_rotation_axis,
                    )
                acmv_validity = validity[:, 1:]
                probs = jax.nn.softmax(res["action_logits"], axis=-1)
                mask = acmv_validity[..., None].astype(movements.dtype)
                acmv = losses.acmv_loss(movements * mask, probs * mask)
                object_loss = object_loss + w.acmv * acmv
                metrics[prefix + "acmv_loss"] = acmv

            if use_gan:
                gan_g = losses.gan_loss(
                    fake_logits_per_object[dynamic_idx], True, self.cfg.gan_mode
                )
                object_loss = object_loss + w.gan * gan_g
                metrics[prefix + "gan_generator_loss"] = gan_g

            total = total + object_loss
            metrics[prefix + "rotations_reconstruction_loss"] = rot_rec
            metrics[prefix + "translations_reconstruction_loss"] = trans_rec
            metrics[prefix + "style_reconstruction_loss"] = style_rec
            metrics[prefix + "deformation_reconstruction_loss"] = deform_rec
            metrics[prefix + "entropy_loss"] = entropy
            metrics[prefix + "action_directions_kl_divergence_loss"] = directions_kl
            metrics[prefix + "action_mutual_information_loss"] = mi_loss

        metrics["loss"] = total
        return total, (metrics, mutated.get("batch_stats", batch_stats), new_extra, results, encoding)

    # ------------------------------------------------------------------

    def encode_batch(self, extra: Dict, batch: Batch, key: jax.Array) -> SceneEncoding:
        """The frozen scene encoding for a raw image batch (shared by the
        generator and discriminator passes; also the cache-builder kernel)."""
        env = extra["environment"]
        return self._scene_encoding(env["params"], env["batch_stats"], batch, key)

    def train_step(
        self, state: TrainState, encoding: SceneEncoding, key: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def loss_fn(params):
            return self.compute_losses(
                params, state.batch_stats, state.extra, encoding, key, state.step
            )

        (_, (metrics, new_batch_stats, new_extra, _, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=new_batch_stats, extra=new_extra
        )
        return new_state, metrics

    def step_with_batch(
        self, state: TrainState, batch: Batch, key: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """Encode ONCE, then run the generator step and (with GAN) the
        discriminator step on the shared encoding — one jitted program."""
        key_env, key_gen, key_disc = jax.random.split(key, 3)
        encoding = self.encode_batch(state.extra, batch, key_env)
        return self.fused_step(state, encoding, (key_gen, key_disc))

    def fused_step(
        self, state: TrainState, encoding: SceneEncoding, keys
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """Generator + (optional) discriminator update on one encoding.

        :param keys: (generator_key, discriminator_key) or a single key."""
        if isinstance(keys, tuple):
            key_gen, key_disc = keys
        else:
            key_gen, key_disc = jax.random.split(keys)
        step = state.step  # G and D share one iteration counter (annealing)
        state, metrics = self.train_step(state, encoding, key_gen)
        if self.playable_model.with_discriminators:
            state, disc_metrics = self.discriminator_step(
                state, encoding, key_disc, step
            )
            metrics = {**metrics, **disc_metrics}
        return state, metrics

    def discriminator_step(
        self,
        state: TrainState,
        encoding: SceneEncoding,
        key: jax.Array,
        step: jnp.ndarray,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """GAN discriminator pass: real = GT encodings, fake = detached
        reconstructions (playable_model_trainer_discriminator.py:195-234,
        forward_only_discriminator semantics).

        :param step: the PRE-generator-update iteration counter, so the
            teacher-forcing annealing schedule matches the generator pass of
            the same G+D pair (the reference uses one counter for both)."""

        def disc_loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            _, key_anim, key_gumbel = jax.random.split(key, 3)
            centroids = self._per_object_centroids(
                [
                    state.extra["centroids"][str(i)]
                    for i in range(len(self.scene_animation_configs()))
                ]
            )
            # Batch-statistics BN like the reference's train-mode forward;
            # the action-module BN mutations are discarded (the generator
            # pass owns the running-stat updates for this step) but the
            # discriminators' spectral-norm power-iteration vectors (u/sigma,
            # also stored in batch_stats) MUST persist — torch spectral_norm
            # carries u across steps; restarting from the init vector every
            # step would never converge to the true spectral norm.
            results, _ = self.playable_model.apply(
                variables,
                encoding,
                self.cfg.ground_truth_observations_at(step),
                centroids,
                None,
                False,
                method=PlayableEnvironmentModel.animate,
                rngs={"action_sampling": key_anim, "gumbel": key_gumbel},
                mutable=["batch_stats"],
            )
            results = jax.lax.stop_gradient(results)
            real_logits, mutated = self.playable_model.apply(
                variables, results, encoding, False, True,
                method=PlayableEnvironmentModel.discriminate,
                mutable=["batch_stats"],
            )
            fake_logits, mutated = self.playable_model.apply(
                {"params": params, "batch_stats": mutated["batch_stats"]},
                results, encoding, True, True,
                method=PlayableEnvironmentModel.discriminate,
                mutable=["batch_stats"],
            )
            loss = jnp.zeros(())
            for real, fake in zip(real_logits, fake_logits):
                loss = loss + losses.gan_loss(real, True, self.cfg.gan_mode)
                loss = loss + losses.gan_loss(fake, False, self.cfg.gan_mode)
            return loss, mutated["batch_stats"]

        import optax

        (loss, new_batch_stats), grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(state.params)
        # Discriminator optimizer (masked to the discriminator subtree; its
        # state lives in extra). The D pass does NOT advance the step counter:
        # one G+D pair is one optimization step, as in the reference.
        updates, new_disc_opt = self.tx_disc.update(
            grads, state.extra["disc_opt_state"], state.params
        )
        new_state = state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_batch_stats,
            extra={**state.extra, "disc_opt_state": new_disc_opt},
        )
        return new_state, {"discriminator_loss": loss}
