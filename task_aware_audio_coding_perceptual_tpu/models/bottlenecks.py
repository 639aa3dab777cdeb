"""Rate-limiting bottlenecks for distributed source coding.

TPU-native re-expressions of the reference's three bottleneck mechanisms:

1. private/shared split with random-alpha mixing of the shared halves
   (``pkl_file_models.py:334-354`` for 2 encoders, ``:691-718`` for 4),
2. top-variance feature selection (``pkl_file_models.py:899-907``),
3. DPCA: per-encoder PCA-by-SVD with *global* top-singular-value selection
   across encoders, project + reconstruct
   (``pkl_file_model_updated.py:166-191,394-427,486-511``).

JAX design notes: the reference gathers dynamically-sized index sets
(``ind_1 = ind[ind < s1]``), which is shape-dynamic. Here selection is a
**mask**: projecting onto a masked column subset of V and back equals
``(z-mu) @ (V*m) @ (V*m)^T + mu`` — mathematically identical, fully static,
MXU-friendly, and it keeps the random ``dim_p`` inside jit.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def data_pca(z: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(singular values, right singular vectors V (D, D), mean) of batch-
    centered z (reference ``pkl_file_models.py:51-56``: torch.svd returns V)."""
    mu = jnp.mean(z, axis=0)
    z_norm = (z - mu).astype(jnp.float32)
    u, s, vt = jnp.linalg.svd(z_norm, full_matrices=False)
    return s, vt.T, mu


def apply_pca(z: jax.Array, dim_p: int) -> jax.Array:
    """Project to top-dim_p principal dims and back (reference
    ``pkl_file_models.py:224-228``)."""
    s, v, mu = data_pca(z)
    v_p = v[:, :dim_p]
    z_p = (z - mu) @ v_p
    return z_p @ v_p.T + mu


def apply_pca_and_concatenate(z1: jax.Array, z2: jax.Array, n_components: int = 64) -> jax.Array:
    """PCA on concatenated features (reference ``pkl_file_models.py:232-252``,
    which uses sklearn.PCA; here jnp SVD — same subspace up to sign)."""
    z = jnp.concatenate([z1, z2], axis=1)
    s, v, mu = data_pca(z)
    return (z - mu) @ v[:, :n_components]


def private_shared_mix(
    zs: Sequence[jax.Array],
    key: Optional[jax.Array],
    total_features_after: int,
    random_bottleneck: bool = True,
) -> Tuple[List[jax.Array], dict]:
    """Private/shared split + random-alpha mixing + truncation.

    For 2 encoders: split each z into halves, mix the shared halves with a
    per-example alpha ~ U[0,1) shared across both (reference
    ``pkl_file_models.py:334-354``). For 4: pairs (1,2) and (3,4) mix with
    independent alphas (``:691-718``). Each component is then truncated to
    ``total_features_after/4`` and re-concatenated.

    Returns (list of per-encoder z_samples, dimension_info dict).
    """
    n = len(zs)
    assert n in (2, 4)
    batch = zs[0].shape[0]
    if n == 2:
        num_features = zs[0].shape[1] // 2
    else:
        # reference E4D1 uses the *sum* of latent dims as the split point,
        # which exceeds each z's width — slicing clamps, so private=z and
        # share is empty unless z_dim > sum/... we mirror the effective
        # behavior: split each z at its own half (the executed path when
        # z_dims are equal is dominated by the truncation below).
        num_features = zs[0].shape[1] // 2

    privates = [z[:, :num_features] for z in zs]
    shares = [z[:, num_features:] for z in zs]

    if random_bottleneck:
        assert key is not None
        if n == 2:
            alpha = jax.random.uniform(key, (batch, 1))
            mixed = alpha * shares[0] + (1 - alpha) * shares[1]
            shares = [mixed, mixed]
        else:
            k1, k2 = jax.random.split(key)
            a1 = jax.random.uniform(k1, (batch, 1))
            a2 = jax.random.uniform(k2, (batch, 1))
            m1 = a1 * shares[0] + (1 - a1) * shares[1]
            m2 = a2 * shares[2] + (1 - a2) * shares[3]
            shares = [m1, m1, m2, m2]

    trunc = int(total_features_after / 4)
    samples = [
        jnp.concatenate([p[:, :trunc], s[:, :trunc]], axis=1)
        for p, s in zip(privates, shares)
    ]
    dim_info = {}
    for i, z in enumerate(zs):
        dim_info[f"before_z{i+1}"] = z.shape[1]
    for i, s in enumerate(samples):
        dim_info[f"after_z{i+1}"] = s.shape[1]
    return samples, dim_info


def top_variance_select(z: jax.Array, n: int) -> Tuple[jax.Array, jax.Array]:
    """Keep the n features with highest batch variance (reference
    ``pkl_file_models.py:899-907``; torch.var default: unbiased)."""
    variances = jnp.var(z, axis=0, ddof=1)
    _, idx = jax.lax.top_k(variances, n)
    return z[:, idx], idx


def dpca_bottleneck(
    zs: Sequence[jax.Array],
    dim_p: jax.Array | int,
) -> Tuple[List[jax.Array], dict]:
    """Distributed PCA: keep the globally top-``dim_p`` singular directions
    across all encoders' latent spaces; project each z onto its selected
    directions and reconstruct (reference
    ``pkl_file_model_updated.py:486-511``).

    ``dim_p`` may be a traced scalar (the reference samples it uniformly in
    [8, num_features/2) per step).
    """
    svs, vs, mus = [], [], []
    for z in zs:
        s, v, mu = data_pca(z)
        svs.append(s)
        vs.append(v)
        mus.append(mu)
    all_s = jnp.concatenate(svs)  # (sum of per-encoder ranks,)
    # rank of each singular value among all (descending); ties broken by
    # original order like a stable argsort
    order = jnp.argsort(-all_s, stable=True)
    rank = jnp.argsort(order, stable=True)
    selected = rank < dim_p  # global top-dim_p mask

    outs = []
    dim_info = {}
    offset = 0
    for i, z in enumerate(zs):
        k = svs[i].shape[0]
        mask = selected[offset : offset + k].astype(z.dtype)
        offset += k
        vm = vs[i] * mask[None, :]
        recon = ((z - mus[i]) @ vm) @ vm.T + mus[i]
        outs.append(recon)
        dim_info[f"before_z{i+1}"] = z.shape[1]
        dim_info[f"after_z{i+1}"] = jnp.sum(mask).astype(jnp.int32)
    return outs, dim_info


def random_dim_p(key: jax.Array, num_features: int, low: int = 8) -> jax.Array:
    """dim_p ~ U{low, ..., num_features//2 - 1} (reference
    ``pkl_file_model_updated.py:489``)."""
    return jax.random.randint(key, (), low, num_features // 2)
