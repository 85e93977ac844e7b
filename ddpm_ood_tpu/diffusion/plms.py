"""PNDM/PLMS sampler as a stateless scan with an epsilon-history ring buffer.

Parity target: monai-generative PNDMScheduler with skip_prk_steps=True (pure PLMS),
as used by the reference reconstruction pipeline (src/trainers/reconstruct.py:98-157)
and its step-count accounting (ood_detection.py:64-71):

  - `set_timesteps(n)` grid: ascending (arange(n) * (T//n)), then the PLMS ordering
    [ts[:-1], ts[-2:-1], ts[-1:]][::-1] — descending with the second-largest timestep
    duplicated (101 entries for n=100).
  - warm-up state machine: 1st-order Euler at counter==0, a Heun-style re-do of the
    first step at counter==1 (re-uses the saved start sample, does NOT append to the
    history), then 2nd/3rd/4th-order Adams-Bashforth on the epsilon history:
        2: (3 e_k - e_{k-1}) / 2
        3: (23 e_k - 16 e_{k-1} + 5 e_{k-2}) / 12
        4: (55 e_k - 59 e_{k-1} + 37 e_{k-2} - 9 e_{k-3}) / 24
  - transfer formula (PNDM paper eq. 11):
        x_prev = sqrt(acp_prev/acp_t) * x
                 - (acp_prev - acp_t) * eps / (acp_t*sqrt(bp_prev) + sqrt(acp_t*bp_t*acp_prev))

Design deviation (documented): the reference constructs ONE scheduler per data batch
and lets the ets history/counter leak across consecutive t_start trajectories
(src/trainers/reconstruct.py:98 + 128-157). Here every trajectory starts with a fresh
history — mathematically the intended PLMS warm-up, and the property that makes the
multi-t_start sweep a single vmapped device program (see recon/sweep.py).

TPU-first: state is a pytree (ring buffer + scalars); one trajectory = one
`lax.scan`; per-lane "active" masking lets many different-length trajectories share a
single scan with static shapes (no dynamic trip counts under jit).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import NoiseSchedule, epsilon_from_model_output


def pndm_timesteps(num_train_timesteps: int = 1000, num_inference_steps: int = 100) -> np.ndarray:
    """Descending PLMS timestep grid incl. the duplicated second-largest entry.

    Matches monai-generative PNDMScheduler.set_timesteps with skip_prk_steps=True
    (101 entries for 1000/100: [990, 980, 980, 970, ..., 10, 0]).
    """
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round().astype(np.int64)
    plms = np.concatenate([ts[:-1], ts[-2:-1], ts[-1:]])[::-1]
    return plms.astype(np.int32)


def pndm_start_points(timesteps_desc: np.ndarray, inference_skip_factor: int = 1) -> np.ndarray:
    """Reconstruction start timesteps: reversed(timesteps)[1::skip_factor].

    (reference src/trainers/reconstruct.py:120). Ascending; includes the duplicate
    second-largest timestep when skip_factor divides its position.
    """
    return np.ascontiguousarray(timesteps_desc[::-1][1::inference_skip_factor])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PLMSState:
    """Carry for the PLMS scan. `ets` is a (4, *sample) ring buffer, index 3 newest."""

    x: jnp.ndarray
    ets: jnp.ndarray  # (4, *x.shape)
    counter: jnp.ndarray  # () int32 — number of active steps taken
    cur_sample: jnp.ndarray  # saved start sample for the counter==1 re-do

    def tree_flatten(self):
        return (self.x, self.ets, self.counter, self.cur_sample), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def plms_init_state(x0_noised: jnp.ndarray) -> PLMSState:
    return PLMSState(
        x=x0_noised,
        ets=jnp.zeros((4,) + x0_noised.shape, dtype=x0_noised.dtype),
        counter=jnp.zeros((), dtype=jnp.int32),
        cur_sample=jnp.zeros_like(x0_noised),
    )


def _transfer(
    sched: NoiseSchedule,
    sample: jnp.ndarray,
    timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
    eps: jnp.ndarray,
) -> jnp.ndarray:
    """PNDM eq. 11 transfer x_t -> x_{t_prev} given an (averaged) epsilon."""
    acp = sched.alphas_cumprod
    final_acp = acp[0]  # set_alpha_to_one=False
    acp_t = acp[jnp.clip(timestep, 0, sched.num_train_timesteps - 1)]
    acp_prev = jnp.where(
        prev_timestep >= 0,
        acp[jnp.clip(prev_timestep, 0, sched.num_train_timesteps - 1)],
        final_acp,
    )
    bp_t = 1.0 - acp_t
    bp_prev = 1.0 - acp_prev
    sample_coeff = jnp.sqrt(acp_prev / acp_t)
    denom = acp_t * jnp.sqrt(bp_prev) + jnp.sqrt(acp_t * bp_t * acp_prev)
    return sample_coeff * sample - (acp_prev - acp_t) * eps / denom


def plms_step(
    sched: NoiseSchedule,
    state: PLMSState,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    step_ratio: int,
    active: jnp.ndarray | bool = True,
) -> PLMSState:
    """One PLMS update. With `active=False` the state is passed through unchanged,
    which is how variable-length trajectories share one fixed-trip-count scan."""
    eps = epsilon_from_model_output(sched, model_output, state.x, t)
    counter = state.counter

    pushed_ets = jnp.concatenate([state.ets[1:], eps[None]], axis=0)

    # Order selector: 0 -> Euler, 1 -> Heun re-do, 2/3/4 -> AB(order).
    branch = jnp.clip(counter, 0, 4)

    def order1(_):
        # counter == 0: out = eps, save start sample, step t -> t - ratio.
        return eps, state.x, t, t - step_ratio, pushed_ets, state.x

    def heun(_):
        # counter == 1: average with previous eps, restart from the saved sample,
        # re-do the t+ratio -> t step. History NOT appended.
        out = (eps + state.ets[3]) / 2.0
        return out, state.cur_sample, t + step_ratio, t, state.ets, state.cur_sample

    def make_ab(order: int):
        coeffs = {
            2: (3.0 / 2.0, -1.0 / 2.0, 0.0, 0.0),
            3: (23.0 / 12.0, -16.0 / 12.0, 5.0 / 12.0, 0.0),
            4: (55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0),
        }[order]

        def ab(_):
            out = (
                coeffs[0] * pushed_ets[3]
                + coeffs[1] * pushed_ets[2]
                + coeffs[2] * pushed_ets[1]
                + coeffs[3] * pushed_ets[0]
            )
            return out, state.x, t, t - step_ratio, pushed_ets, state.cur_sample

        return ab

    out, sample, t_used, t_prev, new_ets, new_cur = jax.lax.switch(
        branch, [order1, heun, make_ab(2), make_ab(3), make_ab(4)], None
    )

    new_x = _transfer(sched, sample, t_used, t_prev, out)

    active = jnp.asarray(active)
    sel = lambda new, old: jnp.where(active, new, old)  # noqa: E731
    return PLMSState(
        x=sel(new_x, state.x),
        ets=sel(new_ets, state.ets),
        counter=jnp.where(active, counter + 1, counter),
        cur_sample=sel(new_cur, state.cur_sample),
    )


def _build_ref_exact_step_table(
    timesteps_desc: np.ndarray, t_starts: np.ndarray, step_ratio: int
) -> dict:
    """Host-side step table for the carried-history sweep as ONE scan.

    The reference's scheduler state (ets history length, global step counter)
    evolves deterministically over the concatenated lane segments, so every
    per-step decision — AB order coefficients, whether the epsilon is appended,
    the Heun re-do's saved-sample reuse, the (t_used, t_prev) transfer pair —
    is known at trace time and becomes a scan input array instead of Python
    control flow.

    Coefficients index the post-push ring buffer `pushed = [ets[1:], eps]`
    oldest-to-newest, so `out = coeffs . pushed` covers every branch:
    Euler (0,0,0,1); Heun re-do (0,0,1/2,1/2) since the previous epsilon sits
    at pushed[2]; AB2 (0,0,-1/2,3/2); AB3 (0,5,-16,23)/12; AB4 (-9,37,-59,55)/24.
    """
    ts_desc = np.asarray(timesteps_desc)
    cols = {k: [] for k in (
        "lane", "t", "t_used", "t_prev", "coeffs",
        "append", "use_cur", "save_cur", "first", "last",
    )}
    counter = 0
    n_ets = 0
    ab = {
        2: (0.0, 0.0, -1.0 / 2.0, 3.0 / 2.0),
        3: (0.0, 5.0 / 12.0, -16.0 / 12.0, 23.0 / 12.0),
        4: (-9.0 / 24.0, 37.0 / 24.0, -59.0 / 24.0, 55.0 / 24.0),
    }
    for k, t_start in enumerate(np.asarray(t_starts)):
        seg = [int(t) for t in ts_desc[ts_desc <= t_start]]
        for j, t in enumerate(seg):
            cols["lane"].append(k)
            cols["t"].append(t)
            cols["first"].append(j == 0)
            cols["last"].append(j == len(seg) - 1)
            if counter == 0:
                n_ets = 1
                row = ((0.0, 0.0, 0.0, 1.0), True, False, True, t, t - step_ratio)
            elif counter == 1:
                row = ((0.0, 0.0, 0.5, 0.5), False, True, False, t + step_ratio, t)
            else:
                n_ets = min(n_ets + 1, 4)
                row = (ab[n_ets], True, False, False, t, t - step_ratio)
            coeffs, append, use_cur, save_cur, t_used, t_prev = row
            cols["coeffs"].append(coeffs)
            cols["append"].append(append)
            cols["use_cur"].append(use_cur)
            cols["save_cur"].append(save_cur)
            cols["t_used"].append(t_used)
            cols["t_prev"].append(t_prev)
            counter += 1
    return {
        "lane": np.asarray(cols["lane"], np.int32),
        "t": np.asarray(cols["t"], np.int32),
        "t_used": np.asarray(cols["t_used"], np.int32),
        "t_prev": np.asarray(cols["t_prev"], np.int32),
        "coeffs": np.asarray(cols["coeffs"], np.float32),
        "append": np.asarray(cols["append"]),
        "use_cur": np.asarray(cols["use_cur"]),
        "save_cur": np.asarray(cols["save_cur"]),
        "first": np.asarray(cols["first"]),
        "last": np.asarray(cols["last"]),
    }


def _ref_exact_scan(mf, sched, x_starts, steps):
    """The carried-history sweep body: one scan over the concatenated lane
    segments. x_starts: (K, B, *sample); steps: the step-table pytree."""
    K = x_starts.shape[0]
    B = x_starts.shape[1]
    sample_shape = x_starts.shape[1:]

    def body(carry, s):
        x, ets, cur, recons = carry
        x = jnp.where(s["first"], x_starts[s["lane"]], x)
        t_batch = jnp.full((B,), s["t"], dtype=jnp.int32)
        eps = epsilon_from_model_output(sched, mf(x, t_batch), x, s["t"])
        pushed = jnp.concatenate([ets[1:], eps[None]], axis=0)
        out = jnp.tensordot(s["coeffs"].astype(x.dtype), pushed, axes=1)
        sample = jnp.where(s["use_cur"], cur, x)
        new_x = _transfer(sched, sample, s["t_used"], s["t_prev"], out)
        ets = jnp.where(s["append"], pushed, ets)
        cur = jnp.where(s["save_cur"], x, cur)
        prev_slot = jax.lax.dynamic_index_in_dim(
            recons, s["lane"], 0, keepdims=False
        )
        recons = jax.lax.dynamic_update_index_in_dim(
            recons, jnp.where(s["last"], new_x, prev_slot), s["lane"], 0
        )
        return (new_x, ets, cur, recons), None

    init = (
        jnp.zeros(sample_shape, x_starts.dtype),
        jnp.zeros((4,) + sample_shape, x_starts.dtype),
        jnp.zeros(sample_shape, x_starts.dtype),
        jnp.zeros((K,) + sample_shape, x_starts.dtype),
    )
    (_, _, _, recons), _ = jax.lax.scan(body, init, steps)
    return recons


# jitted once at module scope: model weights (Partial), schedule tables, start
# samples, and the step table all arrive as traced args, so every batch — and
# every ReconProgram — of the same shapes reuses one compiled program
_ref_exact_scan_jit = jax.jit(_ref_exact_scan)


def plms_reference_exact_sweep(
    sched: NoiseSchedule,
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps_desc: np.ndarray,
    t_starts: np.ndarray,
    num_inference_steps: int,
    b_scale: float = 1.0,
) -> jnp.ndarray:
    """Multi-t_start sweep with the REFERENCE'S carried-history semantics.

    The reference constructs one PNDMScheduler per data batch and loops t_starts
    ascending, so the `ets` epsilon history and step counter LEAK across
    consecutive trajectories (src/trainers/reconstruct.py:98,128-157): every
    trajectory after the first starts at the Adams-Bashforth order the previous
    one ended at, fed by stale epsilons from a different trajectory. This
    function reproduces that exactly — order selection follows the published
    PNDM `step_plms` (len(ets)-based, with the counter==1 Heun re-do) and the
    history/counter persist across lanes.

    The chained state is inherently sequential ACROSS steps, but the history
    evolution is static at trace time, so the whole sweep compiles to one
    `lax.scan` over a precomputed step table (_build_ref_exact_step_table) —
    the parity path runs at device-program speed instead of one dispatch per
    step (the round-2 eager form, kept as plms_reference_exact_sweep_eager for
    golden testing, was ~100x slower through a tunneled chip).

    x0: (B, *spatial, C); noise: (K, B, *spatial, C); t_starts ascending.
    Returns (K, B, *spatial, C) reconstructions (latent-space, still b_scaled).
    """
    from .schedules import add_noise as _add_noise

    step_ratio = sched.num_train_timesteps // num_inference_steps
    steps = _build_ref_exact_step_table(timesteps_desc, t_starts, step_ratio)
    mf = (
        model_fn
        if isinstance(model_fn, jax.tree_util.Partial)
        else jax.tree_util.Partial(model_fn)
    )
    x_starts = jax.vmap(
        lambda n, t: _add_noise(sched, x0 * b_scale, n, t)
    )(jnp.asarray(noise), jnp.asarray(np.asarray(t_starts, np.int32)))
    return _ref_exact_scan_jit(mf, sched, x_starts, steps)


def plms_reference_exact_sweep_eager(
    sched: NoiseSchedule,
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps_desc: np.ndarray,
    t_starts: np.ndarray,
    num_inference_steps: int,
    b_scale: float = 1.0,
) -> jnp.ndarray:
    """Direct Python transcription of the carried-history semantics (the
    round-2 implementation): one jitted UNet call per step with host control
    flow. Kept as the independent cross-check for the scan form — the golden
    tests assert scan == eager == stateful-NumPy-PNDM.
    """
    from .schedules import add_noise as _add_noise

    step_ratio = sched.num_train_timesteps // num_inference_steps
    ts_desc = np.asarray(timesteps_desc)
    if isinstance(model_fn, jax.tree_util.Partial):
        # weights ride along as traced args (not HLO constants — see
        # recon/sweep.py on the 413 closure-constant failure mode)
        _call = jax.jit(lambda mf, x, t: mf(x, t))
        model_call = lambda x, t: _call(model_fn, x, t)  # noqa: E731
    else:
        model_call = jax.jit(model_fn)
    transfer = jax.jit(_transfer)  # NoiseSchedule is a pytree -> traced arg

    ets: list = []
    counter = 0
    cur_sample = None
    recons = []
    for k, t_start in enumerate(np.asarray(t_starts)):
        x = _add_noise(sched, x0 * b_scale, noise[k], jnp.asarray(int(t_start)))
        for t in (int(t) for t in ts_desc[ts_desc <= t_start]):
            t_batch = jnp.full((x.shape[0],), t, dtype=jnp.int32)
            eps = epsilon_from_model_output(sched, model_call(x, t_batch), x, t)
            if counter != 1:
                ets = (ets + [eps])[-4:]
                t_used, t_prev = t, t - step_ratio
            else:
                t_used, t_prev = t + step_ratio, t
            sample = x
            if len(ets) == 1 and counter == 0:
                out = eps
                cur_sample = x
            elif len(ets) == 1 and counter == 1:
                out = (eps + ets[-1]) / 2.0
                sample = cur_sample
                cur_sample = None
            elif len(ets) == 2:
                out = (3.0 * ets[-1] - ets[-2]) / 2.0
            elif len(ets) == 3:
                out = (23.0 * ets[-1] - 16.0 * ets[-2] + 5.0 * ets[-3]) / 12.0
            else:
                out = (
                    55.0 * ets[-1]
                    - 59.0 * ets[-2]
                    + 37.0 * ets[-3]
                    - 9.0 * ets[-4]
                ) / 24.0
            x = transfer(
                sched, sample, jnp.asarray(t_used), jnp.asarray(t_prev), out
            )
            counter += 1
        recons.append(x)
    return jnp.stack(recons)


def plms_denoise(
    sched: NoiseSchedule,
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_start: jnp.ndarray,
    timesteps_desc: jnp.ndarray,
    t_start: jnp.ndarray,
    num_inference_steps: int,
) -> jnp.ndarray:
    """Denoise x_start (noised to t_start) over {timesteps <= t_start} in one scan.

    `model_fn(x, t_batch)` as in ddpm_sample. Equivalent to the reference inner loop
    at src/trainers/reconstruct.py:149-157 with a fresh scheduler per trajectory.
    """
    step_ratio = sched.num_train_timesteps // num_inference_steps
    batch = x_start.shape[0]

    def body(state, t):
        active = t <= t_start
        t_batch = jnp.full((batch,), t, dtype=jnp.int32)
        model_output = model_fn(state.x, t_batch)
        state = plms_step(sched, state, model_output, t, step_ratio, active=active)
        return state, None

    state, _ = jax.lax.scan(body, plms_init_state(x_start), timesteps_desc)
    return state.x
