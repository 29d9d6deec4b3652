"""Multi-chip scaling: device meshes, stream-axis data parallelism, and
time-axis (sequence-parallel) offline rendering with overlap-save halos.

The reference has NO distributed layer (SURVEY.md §2.7) — it is a
single-threaded CPU library. These are the TPU-native scaling components the
north star requires (BASELINE.json), designed around jax.sharding:

  - **Stream DP**: thousands of independent amp streams batched on a leading
    axis and sharded across chips with ``NamedSharding``; zero collectives in
    steady state (streams are independent). This is the production serving
    axis.
  - **Sequence/Time SP**: a long offline render split across devices. Because
    every non-recurrent architecture here is causal and finite-receptive-field
    (ring-buffer lookback contract, reference NAM/conv1d.cpp:126-137), device
    d only needs the last `receptive_field + prewarm` input samples from
    device d-1's chunk: a single ``ppermute`` halo exchange of *raw input*,
    then fully local compute (overlap-save). LSTM's infinite recurrence makes
    time-sharding a sequential chain, so SP is supported for feedforward
    architectures (WaveNet/ConvNet/Linear) and streams DP covers LSTM.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.base import Model

STREAM_AXIS = "streams"
TIME_AXIS = "time"


def make_mesh(
    n_devices: Optional[int] = None,
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = (STREAM_AXIS,),
) -> Mesh:
    """Build a device mesh. Defaults to a 1-D mesh over all devices with a
    'streams' axis. Pass shape/axis_names for 2-D (streams, time) meshes."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh: asked for {n_devices} devices, only "
                f"{len(devices)} available — a silently smaller mesh would "
                "break callers' divisibility/sharding assumptions"
            )
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),)
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def _batch_leaf_spec(mesh: Mesh, axis: str):
    """PartitionSpec sharding the leading (batch) axis of a leaf."""

    def spec_for(leaf):
        ndim = np.ndim(leaf)
        if ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))

    return spec_for


def shard_state(state: Any, mesh: Mesh, axis: str = STREAM_AXIS) -> Any:
    """Place a state pytree so its batch axis is sharded across ``axis``."""
    spec = _batch_leaf_spec(mesh, axis)
    return jax.tree_util.tree_map(lambda l: jax.device_put(l, spec(l)), state)


def replicate_params(params: Any, mesh: Mesh) -> Any:
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda l: jax.device_put(l, rep), params)


def dp_sharded_step(model: Model, mesh: Mesh, axis: str = STREAM_AXIS):
    """Jit the model's block step with stream-axis sharding constraints:
    params replicated, state and audio sharded on the leading batch axis.

    Returns step(params, state, x) -> (y, state'). XLA inserts no collectives
    in the steady state (all ops are batch-parallel); this scales across ICI
    and hosts by construction.
    """
    arch_step = model._jitted_step.__wrapped__  # the un-jitted partial(step, config)
    rep = NamedSharding(mesh, P())
    xsh = NamedSharding(mesh, P(axis, None, None))

    def state_shardings(state):
        spec = _batch_leaf_spec(mesh, axis)
        return jax.tree_util.tree_map(spec, state)

    def make(state_tree):
        in_shardings = (
            jax.tree_util.tree_map(lambda _: rep, model.params),
            state_shardings(state_tree),
            xsh,
        )
        out_shardings = (xsh, state_shardings(state_tree))
        return jax.jit(
            arch_step,
            in_shardings=in_shardings,
            out_shardings=out_shardings,
            donate_argnums=(1,),
        )

    cache = {}

    def step(params, state, x):
        key = jax.tree_util.tree_structure(state)
        if key not in cache:
            cache[key] = make(state)
        return cache[key](params, state, x)

    return step


def dp_sharded_engine_step(engine, mesh: Mesh, axis: str = STREAM_AXIS):
    """Stream-axis sharding for the ring-state engine tier.

    The engine's CTB layout puts the stream batch on the LAST axis of every
    tensor (activations (C, T, B); ring chunks (M, C, T, B); LSTM h/c
    (H, B)), so the sharding rule is: shard the trailing axis of every leaf
    whose trailing dim equals the engine batch; replicate scalars and
    everything else (weights). Returns (sharded_params, sharded_state,
    jitted step(eparams, state, x_ctb) -> (y_ctb, state')).

    Pallas-tier engines route to the shard_map composition (a pallas_call
    does not auto-partition under jit shardings the way plain XLA ops do):
    see dp_sharded_pallas_engine_step. Same return contract either way.

    Pick a batch that differs from T and the channel counts so the rule is
    unambiguous (batch is typically >= 128 anyway for lane alignment).
    """
    if getattr(engine, "kernel", "xla") == "pallas":
        return dp_sharded_pallas_engine_step(engine, mesh, axis)
    B = engine.batch

    def leaf_sharding(leaf):
        nd = np.ndim(leaf)
        if nd >= 1 and np.shape(leaf)[-1] == B:
            return NamedSharding(mesh, P(*([None] * (nd - 1)), axis))
        return NamedSharding(mesh, P())

    state0 = engine.init_state()
    eparams = jax.tree_util.tree_map(
        lambda l: jax.device_put(l, NamedSharding(mesh, P())), engine.params
    )
    state = jax.tree_util.tree_map(lambda l: jax.device_put(l, leaf_sharding(l)), state0)
    xsh = NamedSharding(mesh, P(None, None, axis))

    step = jax.jit(
        engine.step_fn().__wrapped__,
        in_shardings=(
            jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), engine.params),
            jax.tree_util.tree_map(leaf_sharding, state0),
            xsh,
        ),
        out_shardings=(xsh, jax.tree_util.tree_map(leaf_sharding, state0)),
        donate_argnums=(1,),
    )
    return eparams, state, step


def dp_sharded_pallas_engine_step(engine, mesh: Mesh, axis: str = STREAM_AXIS):
    """Stream-axis sharding for the FUSED PALLAS tier via shard_map.

    The fused kernel's grid already tiles the stream batch (ops/pallas/stack
    `_Plan.nt` grid steps of `H*128` streams each), so sharding is "each
    device runs its own pallas_call over its local tiles": wrap the step in
    ``shard_map`` over the stream axis, with ring state sharded on its
    grid-tile axis (rings are (M, nt, C, T*W) — axis 1; tails are
    (nt, C, rf*W) — axis 0) and audio on the trailing stream axis of the CTB
    block. Weights (and the nested-condition pre-pass params) replicate.
    Zero collectives in steady state — streams are independent, so this
    scales "4096/chip × N chips" by construction.

    CRITICAL layout detail: the plan (tile width, ring shapes) must be built
    for the PER-DEVICE batch, not the global batch — `_pick_w` can choose a
    wider tile for the global batch than divides the local one, which would
    make the sharded state chunks unreadable by the local kernel. So this
    function builds its own state with the local-batch plan; do not pass
    ``engine.init_state()`` arrays in.

    Returns (eparams, state, step) with the same contract as
    dp_sharded_engine_step: step(eparams, state, x_ctb[C,T,B_global]) ->
    (y_ctb, state'); state leaves are global jax.Arrays sharded over `axis`.
    """
    from ..ops.pallas import backend_for

    if getattr(engine, "kernel", None) != "pallas":
        raise ValueError("engine is not on the pallas tier")
    cfg = engine.model.config
    backend = backend_for(cfg)
    T = engine.block_size
    n = mesh.shape[axis]
    B = engine.batch
    if B % n != 0:
        raise ValueError(f"batch {B} not divisible by {n} devices on axis {axis!r}")
    Bl = B // n
    reason = backend.supports(cfg, T, Bl)
    if reason is not None:
        raise ValueError(
            f"pallas kernel does not support the per-device batch {Bl}: {reason}"
        )

    # Local plan defines the state layout; the global state is n local states
    # stacked along the grid-tile axis. Initial leaves are uniform across
    # streams (zero rings/tails; broadcast h0/c0 / condition sub-state), so
    # tiling the local state n times along its shard axis is exact.
    eparams_l, state_l = backend.prepare(cfg, engine.model.params, T, Bl)

    def trailing_spec(leaf):
        nd = np.ndim(leaf)
        if nd >= 1 and np.shape(leaf)[-1] == Bl:
            return P(*([None] * (nd - 1)), axis)
        return P()

    if "rings" in state_l:
        # Fused WaveNet stack: the stream batch is folded into grid tiles —
        # rings (M, nt, C, T*W) shard on the tile axis, tails (nt, C, rf*W)
        # on their leading axis; the pre-pass condition subtree (engine CTB
        # layout) shards its trailing stream axis.
        specs = {
            "rings": [P(None, axis, None, None) for _ in state_l["rings"]],
            "tails": [P(axis, None, None) for _ in state_l["tails"]],
            "n": P(),
        }
        if "condition" in state_l:
            specs["condition"] = jax.tree_util.tree_map(trailing_spec, state_l["condition"])
    else:
        # LSTM kernel state (h/c: (L, H, B)) and any other trailing-stream
        # layout: shard the trailing axis.
        specs = jax.tree_util.tree_map(trailing_spec, state_l)

    def tile_global(leaf, spec):
        sharded_axes = [i for i, s in enumerate(spec) if s is not None]
        if not sharded_axes:
            arr = jnp.asarray(leaf)
        else:
            reps = [1] * np.ndim(leaf)
            reps[sharded_axes[0]] = n
            arr = jnp.tile(jnp.asarray(leaf), reps)
        return jax.device_put(arr, NamedSharding(mesh, spec))

    state = jax.tree_util.tree_map(tile_global, state_l, specs)
    rep = NamedSharding(mesh, P())
    eparams = jax.tree_util.tree_map(lambda l: jax.device_put(l, rep), eparams_l)

    def local_step(ep, st, x_local):
        return backend.step(cfg, T, ep, st, x_local)

    xspec = P(None, None, axis)
    fn = jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: P(), eparams_l), specs, xspec),
            out_specs=(xspec, specs),
            # pallas_call outputs carry no varying-manual-axes metadata, so
            # the vma check cannot see that they vary over the stream axis.
            check_vma=False,
        ),
        donate_argnums=(1,),
    )
    return eparams, state, fn


# =============================================================================
# Time-axis sequence parallelism (offline overlap-save render)
# =============================================================================


def _total_context(model: Model) -> int:
    """Samples of left context a device needs so its chunk's outputs match the
    unsharded render: the model's settling time (== prewarm sample count,
    which is 1 + total receptive field for WaveNet/ConvNet). Linear prewarms
    0 samples (reference: NAM/dsp.h:155) but its FIR still reads
    receptive_field-1 history samples, so the halo must cover that."""
    ctx = int(model.get_prewarm_samples())
    if model._arch.name == "Linear":
        ctx = max(ctx, int(model.config.receptive_field) - 1)
    return ctx


def _reject_recurrent(cfg) -> None:
    """A finite raw-input halo can only reproduce feedforward state; LSTM
    recurrence is unbounded — anywhere in the model, including nested
    condition DSPs (reference: condition DSP is any architecture,
    NAM/wavenet/model.cpp:841-852)."""
    from ..models.lstm import LSTMConfig

    if isinstance(cfg, LSTMConfig):
        raise ValueError(
            "time_sharded_render: LSTM (top-level or nested condition DSP) has "
            "unbounded recurrence; use stream DP instead"
        )
    cond = getattr(cfg, "condition_config", None)
    if cond is not None:
        _reject_recurrent(cond)


def time_sharded_render(model: Model, mesh: Mesh, x, axis: str = TIME_AXIS):
    """Render a long signal with the time axis sharded across devices.

    x: (T,) float32, T divisible by the mesh axis size. Each device receives
    its chunk plus a `context` halo of raw input from the previous device via
    ppermute (overlap-save), prepends zeros at the stream head, computes
    locally, and discards the halo outputs. Output is bit-identical to the
    unsharded full render for feedforward models.
    """
    cfg = model.config
    arch = model._arch
    _reject_recurrent(cfg)
    context = _total_context(model)
    n = mesh.shape[axis]
    x = jnp.asarray(x, dtype=jnp.float32)
    T = x.shape[0]
    if T % n != 0:
        raise ValueError(f"time_sharded_render: T={T} not divisible by {n} devices")
    if context > T // n:
        # The halo would have to span >1 left neighbor; zero-padding it would
        # silently corrupt every chunk's head. Fail loudly instead.
        raise ValueError(
            f"time_sharded_render: context {context} exceeds per-device chunk "
            f"{T // n}; use fewer devices or a longer signal"
        )

    def local_fn(params, x_local):
        # x_local: (chunk, C) on each device.
        idx = jax.lax.axis_index(axis)
        # Halo: last `context` samples of the LEFT neighbor's chunk.
        # (context == 0: no halo — x_local[-0:] would be the WHOLE chunk.)
        if context > 0:
            halo_src = x_local[-context:]
            perm = [(i, (i + 1) % n) for i in range(n)]
            halo = jax.lax.ppermute(halo_src, axis, perm)
            # Device 0 has no left neighbor: its halo is stream-head zeros.
            halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
            full = jnp.concatenate([halo, x_local], axis=0)[None]
        else:
            full = x_local[None]
        state = arch.init_state(cfg, params, 1)
        y, _ = arch.step(cfg, params, state, full)
        return y[0, context:, :]

    # Cache the jitted shard_map per (mesh, chunk geometry): a fresh closure
    # per call would recompile the whole model graph on every render.
    cache = model.__dict__.setdefault("_sp_render_cache", {})
    key = (
        tuple(d.id for d in mesh.devices.flat),
        mesh.devices.shape,  # same devices+names but different geometry must not collide
        mesh.axis_names,
        axis,
        context,
        T,
        1 if x.ndim == 1 else x.shape[1],
    )
    fn = cache.get(key)
    if fn is None:
        in_specs = (P(), P(axis, None))
        out_specs = P(axis, None)
        fn = jax.jit(
            jax.shard_map(
                partial(local_fn),
                mesh=mesh,
                in_specs=in_specs,
                out_specs=out_specs,
            )
        )
        cache[key] = fn
    xc = x[:, None] if x.ndim == 1 else x
    y = fn(model.params, xc)
    return y[:, 0] if x.ndim == 1 else y


# =============================================================================
# Streaming time-axis sequence parallelism (per-block halo handoff)
# =============================================================================


def _max_conv_rf(cfg) -> int:
    """Largest single-conv receptive field in a WaveNet config (incl. head
    rechannel, post-stack head, and nested condition DSPs)."""
    from ..models.wavenet import WaveNetConfig, _head_conv_specs, _head_rechannel_spec, _layer_conv_spec

    if not isinstance(cfg, WaveNetConfig):
        raise ValueError(
            f"streaming time-SP supports WaveNet configs (got {type(cfg).__name__}); "
            "LSTM recurrence is unbounded - use stream DP for it"
        )
    rf = 0
    for ac in cfg.layer_arrays:
        for i in range(ac.num_layers):
            rf = max(rf, _layer_conv_spec(ac, i).receptive_field)
        rf = max(rf, _head_rechannel_spec(ac).receptive_field)
    if cfg.head is not None:
        for s in _head_conv_specs(cfg.head):
            rf = max(rf, s.receptive_field)
    if cfg.condition_config is not None:
        rf = max(rf, _max_conv_rf(cfg.condition_config))
    return rf


def time_sharded_stream_step(model: Model, mesh: Mesh, block_per_device: int,
                             axis: str = TIME_AXIS):
    """Streaming sequence parallelism: one long stream whose blocks of
    ``n_devices * block_per_device`` samples are split across the mesh's time
    axis every step.

    Each conv's halo hands off between time-shard neighbors via a cyclic
    ``ppermute`` per block: device d's conv windows start from the last rf
    inputs of device d-1's slice (same block), and the wrap-around tail that
    device 0 receives from device n-1 IS the carry into the next block — the
    ring lookback contract (reference: NAM/conv1d.cpp:126-137) applied across
    both the device and block boundaries. Pointwise ops (1x1s, FiLM,
    activations, gating) are time-local and need no communication.

    Output is equivalent to the unsharded streaming step on the concatenated
    block (tests/test_streaming_sp.py). Requires every conv's receptive
    field <= block_per_device (so a halo spans at most one neighbor), and a
    feedforward architecture (WaveNet, incl. nested WaveNet condition DSPs).

    Returns (state0, step) with step(params, state, x[(n*Tl,) or (n*Tl, C)])
    -> (y, state'); state leaves are sharded on their leading axis.
    """
    from .. import registry
    from ..models import wavenet as wn

    cfg = model.config
    n = mesh.shape[axis]
    Tl = int(block_per_device)
    max_rf = _max_conv_rf(cfg)
    if max_rf > Tl:
        raise ValueError(
            f"block_per_device={Tl} < largest conv receptive field {max_rf}: "
            "a halo would span more than one neighbor"
        )
    perm = [(i, (i + 1) % n) for i in range(n)]

    def sp_conv(spec, p, carry, x):
        """conv1d_step with the halo fetched from the left time-shard
        neighbor instead of local history. carry: (1, rf, C) — meaningful on
        device 0 only (the wrap tail from the previous block)."""
        from ..ops.layers import conv1d_apply_full

        rf = spec.receptive_field
        if rf == 0:
            return conv1d_apply_full(spec, p, x), carry
        tail = x[:, Tl - rf :, :]
        rolled = jax.lax.ppermute(tail, axis, perm)
        idx = jax.lax.axis_index(axis)
        halo = jnp.where(idx == 0, carry, rolled)
        y = conv1d_apply_full(spec, p, jnp.concatenate([halo, x], axis=1))
        return y, rolled

    def cond_step(ccfg, cparams, cstate, cx):
        sub_arch = registry.arch_for_config(ccfg)
        if sub_arch.name != "WaveNet":
            raise ValueError(
                f"streaming time-SP condition DSP must be feedforward (got {sub_arch.name})"
            )
        return wn._step_impl(ccfg, cparams, cstate, cx, sp_conv, cond_step)

    def local_step(params, state, x_local):
        return wn._step_impl(cfg, params, state, x_local, sp_conv, cond_step)

    # Conv carries are (batch, rf, C); giving init_state batch == n and
    # sharding the leading axis hands each device a (1, rf, C) local carry.
    state0 = model._arch.init_state(cfg, model.params, n)
    state_specs = jax.tree_util.tree_map(
        lambda l: P(axis, *([None] * (np.ndim(l) - 1))), state0
    )
    xspec = P(axis, None, None)
    fn = jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), state_specs, xspec),
            out_specs=(xspec, state_specs),
        ),
        donate_argnums=(1,),
    )
    state0 = jax.device_put(
        state0,
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), state_specs),
    )
    Cin = model.num_input_channels

    def step(params, state, x):
        if getattr(x, "ndim", 0) == 3:
            # already in the (n_shards, Tl, C) device layout — e.g. a global
            # jax.Array assembled per-host with make_array_from_process_local_data
            # in a multi-host run (tools/multihost_sim.py); no host reshape.
            if x.shape != (n, Tl, Cin):
                raise ValueError(f"expected {(n, Tl, Cin)} shards, got {x.shape}")
            return fn(params, state, x)
        x = jnp.asarray(x, dtype=jnp.float32)
        flat = x.ndim == 1
        xc = x[:, None] if flat else x
        if xc.shape[0] != n * Tl:
            raise ValueError(f"expected {n * Tl} samples per block, got {xc.shape[0]}")
        y, state = fn(params, state, xc.reshape(n, Tl, Cin))
        y = y.reshape(n * Tl, -1)
        return (y[:, 0] if flat else y), state

    return state0, step
