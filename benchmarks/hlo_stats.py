"""Per-op HLO profile of the fused quadruped benchmark rollout.

This is the decisive layout-copy hunting tool: traces the real fused rollout
with jax.profiler, converts the xplane.pb via xprof's hlo_stats, and prints
the top ops by self time with their category and source attribution.
"data formatting" category = relayout copies = the enemy (trailing tiny
dims under the env vmap are layout poison — fix with component form).

Subtractive profiling inside a phase is unreliable (XLA DCEs stages that do
not feed the scan carry); trust this per-op view for intra-step attribution
and benchmarks/profile_phases.py only for whole-phase totals.

Usage: python benchmarks/hlo_stats.py [BENCH_NUM_ENVS=4096] [TOP=40]
"""

import glob
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 4096))
NUM_STEPS = int(os.environ.get("BENCH_NUM_STEPS", 50))
TOP = int(os.environ.get("TOP", 40))


def _sync(x) -> float:
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def profile_rows(run_fn, sync_out, strip_prefix="jit(rollout)/while/body/closed_call/"):
    """Trace one execution of `run_fn()` (device work synced via
    `sync_out(result)`) and return per-op rows
    [(self_us, category, framework_op, source), ...] sorted by self time.

    Reusable core of this tool (bench.py's in-graph attribution uses it).
    Raises on any profiler/xprof unavailability — callers decide the
    fallback."""
    out = run_fn()
    sync_out(out)  # warm: compile outside the trace

    tmpdir = tempfile.mkdtemp(prefix="hlostats_")
    with jax.profiler.trace(tmpdir):
        out = run_fn()
        sync_out(out)

    pbs = glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"), recursive=True)
    if not pbs:
        raise RuntimeError(f"no xplane.pb under {tmpdir}")
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([pbs[-1]], "hlo_stats", {})
    import json as _json

    table = _json.loads(data) if isinstance(data, (str, bytes)) else data
    cols = [c["label"] for c in table["cols"]]
    idx = {label: i for i, label in enumerate(cols)}

    def col(row, name, default=""):
        i = idx.get(name)
        return row["c"][i]["v"] if i is not None and row["c"][i] else default

    rows = []
    for r in table["rows"]:
        fw = str(col(r, "Framework op name", "")).replace(strip_prefix, "")
        src = str(col(r, "Source Info", ""))
        m = re.search(r"title='([^']*)'", src)
        src = m.group(1) if m else src
        src = src.replace("/root/repo/ambersim_tpu/", "").split(",")[0]
        rows.append(
            (
                float(col(r, "Total self time (us)", 0) or 0),
                col(r, "HLO op category"),
                fw[:80],
                src[:44],
            )
        )
    rows.sort(reverse=True)
    return rows


def rollup(rows, key_index):
    """Aggregate self time by a row field (1 = category, 3 = source)."""
    agg = {}
    for r in rows:
        k = r[key_index]
        if key_index == 3:
            k = k.split(":")[0] or "<unattributed>"
        agg[k] = agg.get(k, 0.0) + r[0]
    return sorted(agg.items(), key=lambda kv: -kv[1])


def main():
    from ambersim_tpu.engine import make_data
    from ambersim_tpu.engine.rollout import rollout as engine_rollout
    from ambersim_tpu.utils.io_utils import load_model_from_file

    path = os.environ.get("BENCH_MODEL", "models/quadruped/quadruped.xml")
    kw = {}
    if os.environ.get("BENCH_CONE") == "elliptic":
        kw["cone"] = "elliptic"
    if os.environ.get("BENCH_BROADPHASE_CAP"):
        kw["broadphase_cap"] = int(os.environ["BENCH_BROADPHASE_CAP"])
    model = load_model_from_file(path, **kw)
    nu = model.nu
    kp, kd = 60.0, 2.0

    d0 = make_data(model)
    keys = jax.random.split(jax.random.PRNGKey(0), NUM_ENVS)
    if nu > 0 and model.nq == nu + 7:  # quadruped-style free base + hinges
        batch = jax.vmap(
            lambda k: d0.replace(qpos=d0.qpos.at[7:].add(0.05 * jax.random.normal(k, (nu,))))
        )(keys)
    else:  # generic: velocity perturbation seeds contact-rich motion
        batch = jax.vmap(
            lambda k: d0.replace(qvel=d0.qvel + 0.05 * jax.random.normal(k, (model.nv,)))
        )(keys)

    if nu > 0 and model.nq == nu + 7:

        def ctrl_fn(d):
            return kp * (jnp.zeros(nu) - d.qpos[7:]) - kd * d.qvel[6:]

    else:
        ctrl_fn = None

    @jax.jit
    def rollout(b):
        return engine_rollout(model, b, NUM_STEPS, ctrl_fn=ctrl_fn, batched=True)

    warm = rollout(batch)
    _sync(warm.qpos)

    rows = profile_rows(lambda: rollout(warm), lambda o: _sync(o.qpos))
    total = sum(r[0] for r in rows)
    print(f"total self time: {total/1e3:.2f} ms over {NUM_STEPS} steps "
          f"({total/NUM_STEPS:.0f} us/step, batch {NUM_ENVS})")
    print(f"{'us/step':>8}  {'%':>5}  {'category':20s} {'source':32s} framework op")
    for t, cat, expr, src in rows[:TOP]:
        print(f"{t/NUM_STEPS:8.1f}  {100*t/total:5.1f}  {cat:20s} {src:32s} {expr}")
    print("\nby category:")
    for cat, t in rollup(rows, 1):
        print(f"  {t/NUM_STEPS:8.1f} us/step  {100*t/total:5.1f}%  {cat}")
    # source-file rollup: which module owns the time (first file in the
    # source-info chain; pallas custom-calls attribute to the kernel file)
    print("\nby source file:")
    for f, t in rollup(rows, 3):
        print(f"  {t/NUM_STEPS:8.1f} us/step  {100*t/total:5.1f}%  {f}")


if __name__ == "__main__":
    main()
