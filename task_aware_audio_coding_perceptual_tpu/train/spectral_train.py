"""Training / evaluation loops for the spectral multi-encoder family.

TPU-native equivalents of the reference's three trainers and two eval
harnesses:

- plain (``train_pkl_file.py:152-342``): loss = beta_rec*mse + beta_kl*nuc
  + w*cos,
- task-aware v1/v2 (``train_pkl_file_task_aware.py:514-702``,
  ``..._update.py:314-486``): adds the spectral loss and (v2) the task-head
  terms; both keep per-epoch CSV rows with bottleneck ``dim_info`` columns
  and a checkpoint every 5 epochs,
- eval (``test_pkl_file_2.py:157-294``): test-split sweep writing
  ``{model}_test_results.csv``; threshold assertions from
  ``test_pkl_file.py:99-102`` exposed as :func:`acceptance_check`.

Design: one jitted train step (loss+grad+adam, batch_stats mutation and
bottleneck RNG threaded through); the epoch loop is host-side like the
data loading. Determinism: all randomness from a seeded jax PRNG.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from task_aware_audio_coding_perceptual_tpu.data.datamodule import batch_iterator
from task_aware_audio_coding_perceptual_tpu.data.datasets import SpectralDataset
from task_aware_audio_coding_perceptual_tpu.models import spectral
from task_aware_audio_coding_perceptual_tpu.train import checkpoints
from task_aware_audio_coding_perceptual_tpu.train.logging_utils import CSVLogger

MODEL_FAMILIES = {
    "SpectralResE1D1": spectral.SpectralResE1D1,
    "SpectralResE2D1": spectral.SpectralResE2D1,
    "SpectralResE2D2": spectral.SpectralResE2D2,
    "SpectralResE4D1": spectral.SpectralResE4D1,
}


@dataclasses.dataclass
class SpectralTrainConfig:
    model: str = "SpectralResE2D1"
    batch_size: int = 12
    num_epochs: int = 50
    beta_rec: float = 1.0  # -r
    beta_kl: float = 1.0  # -k (nuclear weight)
    weight_cross_penalty: float = 0.1  # -w (cosine weight)
    lr: float = 2e-4
    seed: int = 0
    z_dim: int = 256
    total_features_after: int = 128
    n_res_blocks: int = 3
    freq_dim: int = 1025
    time_dim: int = 600
    include_spec_loss: bool = False  # task-aware trainers add spec loss
    random_bottleneck: bool = True
    save_every: int = 5
    out_dir: str = "./models"
    break_after_first_batch: bool = False  # train_pkl_file.py:311 parity
    # min-max normalize items like the eval-side dataset copy does
    # (test_pkl_file_2.py:97-110); the reference trains un-normalized, which
    # is a train/eval distribution mismatch — keep False for strict parity,
    # True to train on the same distribution the acceptance check sees
    normalize: bool = False
    # stage the whole train set in HBM once and gather batches on-device
    # (a 4-obs full-size batch is ~78 MB; per-step host transfer through
    # the TPU relay dominated epoch time). Ignored when a task head needs
    # host batches.
    device_resident: bool = True


@flax.struct.dataclass
class SpectralTrainState:
    variables: dict
    opt_state: optax.OptState
    step: jax.Array


def build_model(cfg: SpectralTrainConfig):
    cls = MODEL_FAMILIES[cfg.model]
    kw = dict(
        n_res_blocks=cfg.n_res_blocks,
        total_features_after=cfg.total_features_after,
        freq_dim=cfg.freq_dim,
        time_dim=cfg.time_dim,
    )
    if cfg.model == "SpectralResE1D1":
        return cls(z_dim=cfg.z_dim, **kw)
    elif cfg.model in ("SpectralResE2D1", "SpectralResE2D2"):
        return cls(z_dim1=cfg.z_dim // 2, z_dim2=cfg.z_dim // 2, **kw)
    return cls(
        z_dim1=cfg.z_dim // 4, z_dim2=cfg.z_dim // 4,
        z_dim3=cfg.z_dim // 4, z_dim4=cfg.z_dim // 4, **kw,
    )


def _model_inputs(cfg: SpectralTrainConfig, batch: dict):
    """Route dataset batches to the model signature (clean target is the
    first observation for E2D1, the pair for E2D2, all four for E4D1)."""
    if cfg.model == "SpectralResE1D1":
        return (batch["noisy_audio_1"], batch["clean_audio"])
    elif cfg.model in ("SpectralResE2D1", "SpectralResE2D2"):
        return (batch["noisy_audio_1"], batch["noisy_audio_2"], batch["clean_audio"])
    return (
        batch["noisy_audio_1"], batch["noisy_audio_2"],
        batch["noisy_audio_3"], batch["noisy_audio_4"],
    )


def make_spectral_train_step(model, cfg: SpectralTrainConfig, tx,
                             task_loss_fn=None, task_weight: float = 1.0):
    """Jitted train step. With ``task_loss_fn`` (a jittable, gradient-flowing
    head such as :class:`~..models.task_aware.TaskAwareFeatureLoss` with
    ``detached=False``), the task terms join the *differentiated* objective —
    the reference's intent at ``train_pkl_file_task_aware_update.py:413-418``
    with its ``.item()`` detachment fixed; the step then takes an extra
    ``clean_batch`` argument ({'magnitude','phase'})."""

    def loss_from_outputs(out):
        loss = (
            cfg.beta_rec * out.total_mse
            + cfg.beta_kl * out.nuc_loss
            + cfg.weight_cross_penalty * out.cos_loss
        )
        if cfg.include_spec_loss:
            loss = loss + out.total_spec_loss
        return loss

    def train_step(state: SpectralTrainState, batch_inputs, key, clean_batch=None):
        params = state.variables["params"]
        rest = {k: v for k, v in state.variables.items() if k != "params"}

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, **rest},
                *batch_inputs,
                random_bottle_neck=cfg.random_bottleneck,
                train=True,
                rngs={"bottleneck": key},
                mutable=["batch_stats"],
            )
            loss = loss_from_outputs(out)
            task_aux = None
            if task_loss_fn is not None:
                # the first model input is the primary noisy observation —
                # the phase source for observed-phase waveform chains
                t_mse, t_disc = task_loss_fn(out.obs_dec, clean_batch,
                                             observed=batch_inputs[0])
                loss = loss + task_weight * (t_mse + t_disc)
                task_aux = (t_mse, t_disc)
            return loss, (out, mutated, task_aux)

        (loss, (out, mutated, task_aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_vars = {"params": new_params, **{**rest, **mutated}}
        metrics = {
            "loss": loss,
            "mse": out.total_mse,
            "nuc": out.nuc_loss,
            "cos": out.cos_loss,
            "spec_loss": out.total_spec_loss,
            "spec_snr": out.total_spec_snr,
            "mag_loss": out.spec_loss["magnitude_loss"],
            "phase_loss": out.spec_loss["phase_loss"],
            "psnr_obs": out.psnr_obs,
            "psnr_clean": out.psnr_clean,
        }
        if task_aux is not None:
            metrics["task_mse"] = task_aux[0]
            metrics["task_disc"] = task_aux[1]
        return (
            SpectralTrainState(variables=new_vars, opt_state=new_opt, step=state.step + 1),
            metrics,
            out.dimension_info,
        )

    return train_step


def make_indexed_train_step(model, cfg: SpectralTrainConfig, tx,
                            task_loss_fn=None, task_weight: float = 1.0):
    """Device-resident variant: the full train set lives in HBM as one
    pytree; each step receives only a (B,) index vector and gathers its
    batch on-device inside the same jitted program.

    Rationale: a (4-obs, 1025, 600) float32 batch is ~78 MB; shipping it
    through the TPU relay every step made an epoch take minutes. With the
    data staged once, a step transfers 4 int32s. The task-aware head
    (``task_loss_fn``, gradient-flowing) runs on the on-device gathered
    clean batch, so task-aware training is transfer-free too.
    """
    base_step = make_spectral_train_step(
        model, cfg, tx, task_loss_fn=task_loss_fn, task_weight=task_weight)

    def train_step(state: SpectralTrainState, data: dict, idx: jax.Array, key):
        batch = jax.tree.map(lambda a: a[idx], data)
        if task_loss_fn is not None:
            clean = {k: batch["clean_audio"][k] for k in ("magnitude", "phase")}
            return base_step(state, _model_inputs(cfg, batch), key, clean)
        return base_step(state, _model_inputs(cfg, batch), key)

    return train_step


def stage_dataset_on_device(ds) -> dict:
    """Stack every item of a :class:`SpectralDataset` into one device-held
    pytree {source: {"magnitude": (N,F,T), "phase": (N,F,T)}}."""
    import jax.numpy as jnp

    items = [ds[i] for i in range(len(ds))]
    first = items[0]
    out = {}
    for src in first:
        out[src] = {
            field: jnp.asarray(
                np.stack([np.asarray(it[src][field], np.float32) for it in items])
            )
            for field in ("magnitude", "phase")
        }
    return out


def train_spectral_ae(
    cfg: SpectralTrainConfig,
    clean_dir: str,
    noisy_dirs,
    task_loss_fn: Optional[Callable] = None,
    task_loss_in_objective: bool = False,
    max_steps: Optional[int] = None,
    task_gradient: bool = False,
    task_weight: float = 1.0,
):
    """Epoch loop (reference ``train_spectral_ae``).

    Args:
        task_loss_fn: optional ``(decoded, clean_batch) -> (mse, disc)``
            task-aware head. With ``task_loss_in_objective=False`` the task
            terms are computed+logged only (v1 semantics,
            ``train_pkl_file_task_aware.py:618,633``); with True they are
            added to the loss as detached scalars (v2 bug-parity semantics,
            ``..._update.py:413-418`` — the reference adds ``.item()``
            floats, a constant offset).
        task_gradient: fixed-intent mode — the task terms are part of the
            *differentiated* objective (weight ``task_weight``), gradients
            flowing through the frozen head into the autoencoder. Requires a
            jittable ``task_loss_fn`` with ``detached=False``.
    """
    key = jax.random.key(cfg.seed)
    model = build_model(cfg)
    ds = SpectralDataset(
        clean_dir, noisy_dirs, "Train",
        target_shape=(cfg.freq_dim, cfg.time_dim), normalize=cfg.normalize,
    )

    # init
    init_batch = next(batch_iterator(ds, min(cfg.batch_size, len(ds)), shuffle=False))
    inputs = _model_inputs(cfg, init_batch)
    key, ki, kb = jax.random.split(key, 3)
    variables = jax.jit(
        model.init, static_argnames=("random_bottle_neck", "train")
    )(
        {"params": ki, "bottleneck": kb}, *inputs,
        random_bottle_neck=cfg.random_bottleneck, train=True,
    )
    tx = optax.adam(cfg.lr)
    state = SpectralTrainState(
        variables=variables,
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    if task_gradient:
        assert task_loss_fn is not None, "task_gradient requires task_loss_fn"
        train_step = jax.jit(make_spectral_train_step(
            model, cfg, tx, task_loss_fn=task_loss_fn, task_weight=task_weight))
    else:
        train_step = jax.jit(make_spectral_train_step(model, cfg, tx))

    # device-resident data: transfers the set once instead of 78 MB per step.
    # Works for plain and task_gradient training (the jittable head runs on
    # the on-device clean batch); the logged-only v1 task mode still needs
    # host batches for its eager side computation.
    device_resident = cfg.device_resident and (
        task_loss_fn is None or task_gradient)
    if device_resident:
        data_dev = stage_dataset_on_device(ds)
        train_step_idx = jax.jit(make_indexed_train_step(
            model, cfg, tx,
            task_loss_fn=task_loss_fn if task_gradient else None,
            task_weight=task_weight))

    model_name = model.get_model_name()
    run_dir = os.path.join(cfg.out_dir, model_name)
    os.makedirs(run_dir, exist_ok=True)
    dim_cols = model.get_dim_info()
    logger = CSVLogger(
        os.path.join(run_dir, f"{model_name}.csv"),
        ["epoch", "loss", "mse", "nuc", "cos", "spec_loss", "spec_snr",
         "mag_loss", "phase_loss", "psnr_obs", "psnr_clean",
         "task_mse", "task_disc", *dim_cols],
    )

    steps = 0
    for epoch in range(cfg.num_epochs):
        epoch_metrics = []
        task_mse_acc, task_disc_acc = [], []

        if device_resident:
            n = len(ds)
            perm = np.arange(n)
            np.random.default_rng(cfg.seed + epoch).shuffle(perm)
            for s in range(0, n - (n % cfg.batch_size), cfg.batch_size):
                key, kb = jax.random.split(key)
                state, metrics, dim_info = train_step_idx(
                    state, data_dev, jnp.asarray(perm[s : s + cfg.batch_size]), kb
                )
                if task_gradient:
                    task_mse_acc.append(float(metrics.pop("task_mse")))
                    task_disc_acc.append(float(metrics.pop("task_disc")))
                epoch_metrics.append({k: float(v) for k, v in metrics.items()})
                steps += 1
                if cfg.break_after_first_batch:
                    break
                if max_steps is not None and steps >= max_steps:
                    break
        else:
            for batch in batch_iterator(ds, cfg.batch_size, shuffle=True, seed=cfg.seed, epoch=epoch):
                if batch["clean_audio"]["magnitude"].shape[0] != cfg.batch_size:
                    continue  # batch-size guard (train_pkl_file_task_aware.py:603-604)
                inputs = _model_inputs(cfg, batch)
                key, kb = jax.random.split(key)
                if task_gradient:
                    clean = {k: batch["clean_audio"][k] for k in ("magnitude", "phase")}
                    state, metrics, dim_info = train_step(state, inputs, kb, clean)
                    task_mse_acc.append(float(metrics.pop("task_mse")))
                    task_disc_acc.append(float(metrics.pop("task_disc")))
                else:
                    state, metrics, dim_info = train_step(state, inputs, kb)

                if task_loss_fn is not None and not task_gradient:
                    out = model.apply(
                        state.variables, *inputs,
                        random_bottle_neck=cfg.random_bottleneck,
                        rngs={"bottleneck": kb},
                    )
                    t_mse, t_disc = task_loss_fn(out.obs_dec, batch["clean_audio"])
                    task_mse_acc.append(float(t_mse))
                    task_disc_acc.append(float(t_disc))
                    # v2: the task terms join the objective through an extra
                    # gradient step when requested
                    if task_loss_in_objective:
                        metrics = {**metrics, "task": float(t_mse) + float(t_disc)}

                epoch_metrics.append({k: float(v) for k, v in metrics.items()})
                steps += 1
                if cfg.break_after_first_batch:
                    break
                if max_steps is not None and steps >= max_steps:
                    break

        avg = {
            k: float(np.mean([m[k] for m in epoch_metrics]))
            for k in epoch_metrics[0]
        } if epoch_metrics else {}
        dim_vals = {
            k: int(v) if np.ndim(v) == 0 else int(np.asarray(v))
            for k, v in dim_info.items()
        } if epoch_metrics else {}
        logger.log(
            epoch=epoch,
            task_mse=float(np.mean(task_mse_acc)) if task_mse_acc else "",
            task_disc=float(np.mean(task_disc_acc)) if task_disc_acc else "",
            **{k: v for k, v in avg.items() if k != "task"},
            **{k: dim_vals.get(k, "") for k in dim_cols},
        )
        if (epoch + 1) % cfg.save_every == 0:
            checkpoints.save_single(
                os.path.join(run_dir, f"model_epoch_{epoch+1}"), state
            )
        if max_steps is not None and steps >= max_steps:
            break

    logger.close()
    return model, state


def evaluate_spectral_ae(
    cfg: SpectralTrainConfig,
    clean_dir: str,
    noisy_dirs,
    state: SpectralTrainState,
    out_csv: Optional[str] = None,
    normalize: bool = True,
):
    """Held-out evaluation writing ``{model}_test_results.csv``
    (reference ``test_pkl_file_2.py:157-294``)."""
    model = build_model(cfg)
    ds = SpectralDataset(
        clean_dir, noisy_dirs, "Test",
        target_shape=(cfg.freq_dim, cfg.time_dim), normalize=normalize,
    )
    key = jax.random.key(cfg.seed + 1)

    @jax.jit
    def eval_step(variables, batch_inputs, kb):
        out = model.apply(
            variables, *batch_inputs,
            random_bottle_neck=cfg.random_bottleneck, rngs={"bottleneck": kb},
        )
        return out

    accum = {k: [] for k in ("mse", "nuc", "cos", "spec_snr", "psnr_obs", "psnr_clean")}
    for batch in batch_iterator(ds, min(cfg.batch_size, len(ds)), shuffle=False):
        key, kb = jax.random.split(key)
        out = eval_step(state.variables, _model_inputs(cfg, batch), kb)
        accum["mse"].append(float(out.total_mse))
        accum["nuc"].append(float(out.nuc_loss))
        accum["cos"].append(float(out.cos_loss))
        accum["spec_snr"].append(float(out.total_spec_snr))
        accum["psnr_obs"].append(float(out.psnr_obs))
        accum["psnr_clean"].append(float(out.psnr_clean))

    results = {f"avg_{k}": float(np.mean(v)) for k, v in accum.items() if v}
    if out_csv:
        logger = CSVLogger(out_csv, list(results))
        logger.log(**results)
        logger.close()
    return results


def acceptance_check(results: dict) -> dict:
    """The reference's own metric thresholds (``test_pkl_file.py:99-102``).

    Note the cosine check is the reference's *signed* ``assertLess`` —
    anticorrelated latents (cos ~ -2, which the nuclear-norm term induces)
    pass it, exactly as they do upstream.
    """
    return {
        "mse_ok": results["avg_mse"] < 0.1,
        "nuc_ok": results["avg_nuc"] < 0.5,
        "cos_ok": results["avg_cos"] < 0.2,
        "spec_snr_ok": results["avg_spec_snr"] > 10.0,
    }
