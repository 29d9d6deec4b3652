"""Two-process multi-host simulation of the scale-out story (BASELINE.json
config #5: "channels sharded across N>=2 hosts").

Real multi-host hardware is unavailable in this sandbox, so this simulates
it faithfully at the JAX level: two OS processes, each owning half the
devices of one global mesh via jax.distributed (the same process topology a
v5p pod slice uses, with gloo/XLA CPU collectives standing in for DCN/ICI).

Per process: 4 local virtual CPU devices -> an 8-device global mesh.
Exercised modes:
  1. stream-axis DP of the engine step — each host owns half the streams;
     steady state has NO cross-host collectives (streams are independent),
     which is exactly why DP across hosts is the production scaling axis;
  2. streaming time-SP — per-block conv-halo ppermute where one hop crosses
     the process (host) boundary, i.e. real cross-host traffic per block.

Both modes check outputs against a single-process reference computed
locally. Run: python tools/multihost_sim.py   (spawns the two workers)
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_PROC = 2
LOCAL_DEVICES = 4


def _free_port() -> int:
    """Ephemeral coordinator port: a fixed one flakes when a previous run
    left it in TIME_WAIT or another service holds it."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def worker(pid: int) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{os.environ['NAM_MULTIHOST_PORT']}",
        num_processes=N_PROC,
        process_id=pid,
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import neuralampmodelercore_tpu as nam
    from neuralampmodelercore_tpu.parallel.sharding import (
        STREAM_AXIS,
        TIME_AXIS,
        time_sharded_stream_step,
    )

    assert jax.process_count() == N_PROC
    n_global = jax.device_count()
    assert n_global == N_PROC * LOCAL_DEVICES, (jax.device_count(), jax.local_device_count())

    model = nam.load_model("/root/reference/example_models/wavenet.nam")
    model.prewarm_on_reset = False

    # ---- 1. stream-axis DP across both hosts --------------------------------
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_global), (STREAM_AXIS,))
    B, T = 2 * n_global, 32
    rep = NamedSharding(mesh, P())
    xsh = NamedSharding(mesh, P(STREAM_AXIS, None, None))

    params = jax.device_put(model.params, rep)
    state0 = model.init_state(B)
    st_sh = jax.tree_util.tree_map(
        lambda l: NamedSharding(mesh, P(STREAM_AXIS, *([None] * (np.ndim(l) - 1)))), state0
    )
    state = jax.tree_util.tree_map(lambda l, s: jax.device_put(l, s), state0, st_sh)

    step = jax.jit(
        model._jitted_step.__wrapped__,
        in_shardings=(jax.tree_util.tree_map(lambda _: rep, model.params), st_sh, xsh),
        out_shardings=(xsh, st_sh),
    )
    rng = np.random.default_rng(0)  # same seed on both processes
    x_host = (rng.standard_normal((B, 3 * T)) * 0.3).astype(np.float32)

    ref_state = model.init_state(B)
    worst = 0.0
    for i in range(3):
        blk = x_host[:, i * T : (i + 1) * T, None]
        xg = jax.make_array_from_process_local_data(xsh, blk[pid * (B // 2) : (pid + 1) * (B // 2)])
        y, state = step(params, state, xg)
        y_local = np.concatenate([np.asarray(s.data) for s in y.addressable_shards], axis=0)
        y_ref, ref_state = model.process(x_host[:, i * T : (i + 1) * T], ref_state)
        mine = np.asarray(y_ref)[pid * (B // 2) : (pid + 1) * (B // 2), :, None]
        worst = max(worst, float(np.abs(y_local - mine).max()))
    print(f"[proc {pid}] DP across {N_PROC} hosts x {LOCAL_DEVICES} devices: "
          f"max abs err vs local reference = {worst:.2e}", flush=True)
    assert worst < 1e-5

    # ---- 2. streaming time-SP with a cross-host ppermute hop ----------------
    tmesh = Mesh(np.asarray(jax.devices()).reshape(n_global), (TIME_AXIS,))
    Tl = 32
    sp_state, sp_step = time_sharded_stream_step(model, tmesh, block_per_device=Tl)
    ref_state = model.init_state(1)
    worst_sp = 0.0
    for i in range(3):
        blk = (rng.standard_normal(n_global * Tl) * 0.3).astype(np.float32)
        # global (n, Tl, 1) input: each process contributes its local shards
        xg_local = blk.reshape(n_global, Tl, 1)[
            pid * LOCAL_DEVICES : (pid + 1) * LOCAL_DEVICES
        ]
        # global (n, Tl, C) array assembled from each host's local shards;
        # step() passes 3-D inputs straight to the sharded fn
        xsh_sp = NamedSharding(tmesh, P(TIME_AXIS, None, None))
        xg = jax.make_array_from_process_local_data(xsh_sp, xg_local)
        y, sp_state = sp_step(model.params, sp_state, xg)
        y_ref, ref_state = model.process(blk[None], ref_state)
        y_local = np.concatenate([np.asarray(s.data) for s in y.addressable_shards], axis=0)
        mine = np.asarray(y_ref)[0].reshape(n_global, Tl, -1)[
            pid * LOCAL_DEVICES : (pid + 1) * LOCAL_DEVICES
        ]
        worst_sp = max(worst_sp, float(np.abs(y_local - mine).max()))
    print(f"[proc {pid}] streaming time-SP with cross-host halo hop: "
          f"max abs err = {worst_sp:.2e}", flush=True)
    assert worst_sp < 1e-5

    # ---- 3. FUSED PALLAS kernel DP across both hosts (interpret mode) -------
    # The production kernel under shard_map with shards owned by DIFFERENT
    # processes — the "4096/chip x N chips" axis at the multi-host level
    # (parallel/sharding.py dp_sharded_pallas_engine_step).
    from neuralampmodelercore_tpu.models.engine import StreamEngine
    from neuralampmodelercore_tpu.ops.pallas import stack as _stack
    from neuralampmodelercore_tpu.parallel.sharding import dp_sharded_engine_step

    _stack.INTERPRET = True
    try:
        Bp, Tp = 128 * n_global, 8
        peng = StreamEngine(model, batch=Bp, block_size=Tp, kernel="pallas")
        pparams, pstate, pstep = dp_sharded_engine_step(peng, mesh)
        pxsh = NamedSharding(mesh, P(None, None, STREAM_AXIS))
        ust = peng.reset(prewarm=False)
        rng_p = np.random.default_rng(7)  # same stream on both processes
        worst_p = 0.0
        Bl = Bp // N_PROC
        for i in range(2):
            blk = (rng_p.standard_normal((Bp, Tp)) * 0.3).astype(np.float32)
            local = blk.T[None][:, :, pid * Bl : (pid + 1) * Bl]  # (1, Tp, Bl)
            xg = jax.make_array_from_process_local_data(pxsh, local)
            y, pstate = pstep(pparams, pstate, xg)
            yu, ust = peng.process(blk, ust)  # unsharded local reference
            mine = np.asarray(yu).T[None]  # (1, Tp, Bp), this host's view
            worst_p = max(
                worst_p,
                max(
                    float(np.abs(np.asarray(s.data) - mine[:, :, s.index[2]]).max())
                    for s in y.addressable_shards
                ),
            )
        print(f"[proc {pid}] sharded-PALLAS DP across {N_PROC} hosts: "
              f"max abs err vs unsharded kernel = {worst_p:.2e}", flush=True)
        assert worst_p < 1e-5
    finally:
        _stack.INTERPRET = False
    return 0


def main() -> int:
    if not os.path.exists("/root/reference/example_models/wavenet.nam"):
        print("multihost_sim: reference fixtures not mounted; skipping")
        return 0
    if os.environ.get("NAM_MULTIHOST_PID") is not None:
        return worker(int(os.environ["NAM_MULTIHOST_PID"]))
    port = _free_port()
    procs = []
    for pid in range(N_PROC):
        env = dict(
            os.environ,
            NAM_MULTIHOST_PID=str(pid),
            NAM_MULTIHOST_PORT=str(port),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=f"--xla_force_host_platform_device_count={LOCAL_DEVICES}",
        )
        env.pop("PALLAS_AXON_POOL_IPS", None)  # skip the axon TPU registration
        procs.append(subprocess.Popen([sys.executable, "-u", os.path.abspath(__file__)], env=env))
    rc = 0
    for p in procs:
        rc |= p.wait()
    print("multihost_sim:", "OK" if rc == 0 else "FAILED")
    return rc


if __name__ == "__main__":
    sys.exit(main())
