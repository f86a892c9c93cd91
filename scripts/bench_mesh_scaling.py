"""Multi-chip throughput evidence on the virtual CPU mesh (VERDICT r4 #5).

Real multi-chip hardware is absent in this environment (one tunneled TPU
chip), so this script produces the two measurable pieces of the DP-scaling
story on the 8-virtual-CPU-device mesh:

(a) **Compiled-program overhead bound** — step time of the jitted stage-1 /
    stage-2 train step on an 8-device mesh vs the 1-device mesh at the SAME
    TOTAL batch. This host has ONE core, so the partitioned program's
    compute is serialized onto the same silicon as the unpartitioned one:
    the ratio t(mesh8)/t(mesh1) - 1 is an upper bound on everything GSPMD
    added (collectives, resharding copies, partition bookkeeping) as a
    fraction of step compute. On real chips the compute divides by 8 while
    the added work stays, so the per-chip overhead fraction is ~8x this
    number — still a bound worth recording.

(b) **Collective byte census** — the 8-device program's HLO is parsed for
    collective ops (all-reduce / reduce-scatter / all-gather /
    collective-permute) and their output bytes summed, giving the measured
    bytes-over-ICI per step next to the step's FLOPs (cost_analysis). The
    production-scale projection uses the same per-parameter coefficients
    (collective bytes scale with param bytes, not batch).

Run: python scripts/bench_mesh_scaling.py  (CPU-only; safe while the TPU
is busy). Prints one JSON line per measurement plus a summary block for
PERF.md.
"""
import json
import os
import re
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __graft_entry__ as ge  # noqa: E402  (provisions CPU devices)

N_DEV = int(os.environ.get("APNERF_MESH_N", "8"))
STEPS = int(os.environ.get("APNERF_MESH_STEPS", "10"))
devices = ge._provision_cpu_devices(N_DEV)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from apnerf.models import tineuvox, temporal_points as tp  # noqa: E402
from apnerf.parallel import mesh as pmesh  # noqa: E402
from apnerf.train.masked_adam import create_optimizer  # noqa: E402
from apnerf.train import stage1, stage2  # noqa: E402

_COLL = re.compile(
    r"^\s*(?:\S+\s*=\s*)?((?:f|bf|s|u|pred)[0-9]*\[[^\]]*\][^=]*)\s*"
    r"(all-reduce|reduce-scatter|all-gather|collective-permute|"
    r"all-to-all)\b", re.M)
_SHAPE = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|pred)\[([0-9,]*)\]")
_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
          "u8": 1, "pred": 1}


def collective_census(compiled):
    """Sum output bytes of every collective op in the compiled HLO."""
    txt = compiled.as_text()
    per_op = {}
    n_ops = 0
    for line in txt.splitlines():
        m = re.search(
            r"=\s*((?:\(|f32|bf16|f16|s32|u32|s8|u8|pred)[^ ]*)\s+"
            r"(all-reduce|reduce-scatter|all-gather|collective-permute|"
            r"all-to-all)", line)
        if not m:
            continue
        n_ops += 1
        shp, op = m.group(1), m.group(2)
        b = 0
        for dt, dims in _SHAPE.findall(shp):
            n = 1
            for d in dims.split(","):
                if d.strip():
                    n *= int(d)
            b += n * _BYTES[dt]
        per_op[op] = per_op.get(op, 0) + b
    return {"n_collectives": n_ops, "bytes_by_op": per_op,
            "total_bytes": sum(per_op.values())}


def time_step(fn, args, steps=STEPS):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "ndim") and x.ndim == 0
        else x, out)  # warmup + readback
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    # chain a host readback of one scalar to force completion
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "ndim")]
    np.asarray(leaves[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / steps, out


def build_stage1(mesh, total_rays):
    poses, Ks = ge._tiny_scene()
    cfg_model = tineuvox.TiNeuVoxConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1), num_voxels=32 ** 3,
        num_voxels_base=32 ** 3, voxel_dim=4, defor_depth=2, net_width=64,
        posbase_pe=4, viewbase_pe=2, timebase_pe=2, gridbase_pe=1,
        alpha_init=1e-3)
    params = tineuvox.init_params(jax.random.PRNGKey(0), cfg_model)
    cfg_train = {
        "_stepsize": 0.5, "lrate_decay": 20, "N_rand": total_rays,
        "lrate_feature": 8e-2, "lrate_featurenet": 8e-4,
        "lrate_deformation_net": 6e-4, "lrate_densitynet": 8e-4,
        "lrate_timenet": 8e-4, "lrate_rgbnet": 8e-4,
        "weight_main": 1.0, "weight_entropy_last": 1e-3,
        "weight_rgbper": 1e-2, "weight_distortion": 5e-2,
        "weight_mask_loss": 0.0, "weight_tv_feature": 1e-4,
        "skip_zero_grad_fields": ["feature"],
    }
    optimizer = create_optimizer(params, cfg_train)
    params = pmesh.put_replicated(params, mesh)
    opt_state = pmesh.put_zero1(optimizer.init(params), mesh)
    Ks_d = pmesh.put_replicated(jnp.asarray(Ks), mesh)
    poses_d = pmesh.put_replicated(jnp.asarray(poses), mesh)
    step = stage1.make_train_step(cfg_model, cfg_train, optimizer, Ks_d,
                                  poses_d, 32, 32, 0.5, 6.0, 1.0,
                                  zero1_mesh=mesh)
    rng = np.random.default_rng(0)
    batch = {
        "rgb": np.ones((total_rays, 3), np.float32) * 0.5,
        "mask": np.ones(total_rays, np.float32),
        "time": np.zeros(total_rays, np.float32),
        "cam": (np.arange(total_rays) % 2).astype(np.int32),
        "pix": rng.integers(0, 32 * 32, total_rays).astype(np.int32),
    }
    batch = pmesh.put_ray_sharded(batch, mesh)
    tv_on = jax.device_put(jnp.float32(1.0), pmesh.replicated(mesh))
    return step, (params, opt_state, batch, tv_on)


def build_stage2(mesh, total_rays):
    poses, Ks = ge._tiny_scene()
    P_pts, J = 512, 5
    rng = np.random.default_rng(1)
    pcd = rng.normal(size=(P_pts, 3)).astype(np.float32) * 0.3
    joints = rng.normal(size=(J, 3)).astype(np.float32) * 0.3
    bones = [[0, 1], [1, 2], [0, 3], [3, 4]]
    feat = rng.normal(size=(P_pts, 8)).astype(np.float32)
    mcfg = tp.TemporalPointsConfig(
        n_points=P_pts, n_joints=J, feat_dim=8, neighbours=4,
        timebase_pe=2, posbase_pe=4, viewbase_pe=2, stepsize=0.5,
        voxel_size=0.125, voxel_size_ratio=1.0, act_shift=-6.9,
        sample_budget=256, max_steps=64)
    import apnerf.ops.nn as onn
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    tnv_params = {
        "rgbnet": tineuvox.init_rgbnet(ks[0], 8, mcfg.views_ch),
        "densitynet": onn.init_mlp(ks[1], [8, 1]),
        "timenet": onn.init_mlp(ks[2], [mcfg.t_dim, 16, 8]),
    }
    p2 = tp.init_params(jax.random.PRNGKey(3), mcfg, pcd, joints, bones,
                        feat, np.ones(P_pts, np.float32) * 0.5,
                        np.ones((P_pts, 3), np.float32) * 0.5, tnv_params)
    state = tp.init_state(mcfg, pcd, joints, bones, pcd[:16],
                          pcd.min(0) - 0.2, pcd.max(0) + 0.2)
    cfg2 = {
        "lrate_decay": 160, "weight_render": 2e2, "weight_arap": 5e-3,
        "weight_tv": 1e1, "weight_sparsity": 2e-1,
        "weight_transformation_reg": 1e-1, "weight_joint_chamfer": 1.0,
        "weight_chamfer2D": 5e-3, "lrate_rgbnet": 1e-4,
        "lrate_densitynet": 1e-4, "lrate_canonical_feat": 1e-4,
        "lrate_gammas": 1e-3, "lrate_weights": 1e-4,
        "lrate_theta_weight": 1e-4, "lrate_forward_warp": 1e-4,
        "lrate_joints": 1e-5, "lrate_feat_net": 1e-3,
        "skip_zero_grad_fields": [],
    }
    opt2 = create_optimizer(p2, cfg2)
    p2 = pmesh.put_replicated(p2, mesh)
    st2 = pmesh.put_replicated(
        {k2: v for k2, v in state.items()
         if k2 != "bones" and v is not None}, mesh)
    st2["bones"] = state["bones"]
    st2["frozen_view_dir"] = None
    os2 = pmesh.put_zero1(opt2.init(p2), mesh, min_size=64)
    step2 = stage2.make_train_step(
        mcfg, st2, cfg2, opt2, pmesh.put_replicated(jnp.asarray(Ks), mesh),
        pmesh.put_replicated(jnp.asarray(poses), mesh), 32, 32,
        0.5, 6.0, 1.0, n_chamfer_views=2, zero1_mesh=mesh,
        zero1_min_size=64)
    batch = {
        "rgb": np.ones((total_rays, 3), np.float32) * 0.5,
        "mask": np.ones(total_rays, np.float32),
        "t": np.float32(0.25),
        "cam": (np.arange(total_rays) % 2).astype(np.int32),
        "pix": rng.integers(0, 32 * 32, total_rays).astype(np.int32),
        "sparsity_on": np.float32(1.0),
        "chamfer_poses": jnp.asarray(poses),
        "chamfer_Ks": jnp.asarray(Ks),
        "chamfer_mask_pts": jnp.asarray(
            rng.uniform(0, 32, (2, 64, 2)).astype(np.float32)),
        "chamfer_pcd_idx": jnp.asarray(
            rng.integers(0, P_pts, 64).astype(np.int32)),
    }
    batch = pmesh.put_ray_sharded(batch, mesh)
    return step2, (p2, os2, batch)


def grad_param_bytes(args):
    """Bytes of the trainable params (the DP gradient payload)."""
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(args[0])
               if hasattr(x, "shape"))


def run(name, build, total_rays):
    res = {"bench": name, "total_rays": total_rays, "host_cores": os.cpu_count()}
    times = {}
    for n in (1, N_DEV):
        mesh = Mesh(np.array(devices[:n]), (pmesh.RAY_AXIS,))
        step, args = build(mesh, total_rays)
        t, _ = time_step(step, args)
        times[n] = t
        if n == N_DEV:
            lowered = jax.jit(step).lower(*args) if not hasattr(
                step, "lower") else step.lower(*args)
            compiled = lowered.compile()
            res["collectives"] = collective_census(compiled)
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            res["step_flops"] = float(ca.get("flops", float("nan")))
            res["param_bytes"] = grad_param_bytes(args)
    res["t_mesh1_s"] = round(times[1], 4)
    res[f"t_mesh{N_DEV}_s"] = round(times[N_DEV], 4)
    res["overhead_frac_1core"] = round(times[N_DEV] / times[1] - 1.0, 4)
    print(json.dumps(res), flush=True)
    return res


if __name__ == "__main__":
    r1 = run("stage1_step", build_stage1, 64)
    r2 = run("stage2_step", build_stage2, 64)
    print(json.dumps({"summary": {
        "stage1_overhead_frac": r1["overhead_frac_1core"],
        "stage2_overhead_frac": r2["overhead_frac_1core"],
        "stage1_collective_bytes": r1["collectives"]["total_bytes"],
        "stage2_collective_bytes": r2["collectives"]["total_bytes"],
    }}))
