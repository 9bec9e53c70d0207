"""Op-level time breakdown of a train-step program on the real TPU.

Captures a jax.profiler trace, then classifies every device-side fusion
event by joining against the compiled HLO: a fusion whose called
computation contains a `dot(` is MXU work, otherwise VPU/memory work
(elementwise, reduce, copy).  This is the measured answer to "where do the
non-MXU 2/3 of the step go" (VERDICT r4 item 1) without needing the
(broken-here) tensorboard_plugin_profile converter.

Usage: python scripts/profile_breakdown.py [--spinn|--w128]
"""

import collections
import glob
import gzip
import json
import re
import shutil
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/neuralpde_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, Interval, PDESystem, PhysicsInformedNN,
    SeparableNet, SeparableTraining, StochasticTraining, Transformed,
    discretize, mlp, symbols,
)
from neuralpde_tpu.train import make_step


def build_dense(batch=524288, microbatch=32768, hidden=64):
    x, y = symbols("x y")
    u = DepVar("u")
    eq = Eq((Differential(x) ** 2)(u(x, y)) + (Differential(y) ** 2)(u(x, y)),
            -npde.sin(np.pi * x) * npde.sin(np.pi * y))
    bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0),
           Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])
    disc = PhysicsInformedNN(
        mlp([2, hidden, hidden, 1]),
        StochasticTraining(batch, bcs_points=batch // 8,
                           microbatch=microbatch),
        derivative="jet")
    prob = discretize(system, disc)
    points = batch + 4 * (batch // 8)
    return prob, points


def build_spinn(n=16384, rank=64, hidden=64):
    x, y = symbols("x y")
    u = DepVar("u")
    eq = Eq((Differential(x) ** 2)(u(x, y)) + (Differential(y) ** 2)(u(x, y)),
            -npde.sin(np.pi * x) * npde.sin(np.pi * y))
    system = PDESystem(eq, [],
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])
    hard = lambda c, o: c * (1 - c) * o
    net = SeparableNet([Transformed(mlp([1, hidden, hidden, rank]), hard)
                        for _ in range(2)])
    disc = PhysicsInformedNN(net, SeparableTraining(dx=1.0 / (n - 1)),
                             dtype=jnp.float32)
    prob = discretize(system, disc)
    return prob, n * n


def main():
    steps = 20
    if "--spinn" in sys.argv:
        prob, points = build_spinn()
        tag = "spinn"
    elif "--w128" in sys.argv:
        prob, points = build_dense(batch=32768, microbatch=None, hidden=128)
        tag = "w128"
    else:
        prob, points = build_dense()
        tag = "dense"

    opt = optax.adam(1e-3)
    lf = prob.pinnrep.loss_functions
    step = make_step(prob.loss, opt, prob.pinnrep.adaloss,
                     lf.pde_loss_functions, lf.bc_loss_functions)
    theta = prob.init_params
    n_bc = len(lf.bc_loss_functions)
    ada = prob.pinnrep.adaloss.init_state(1, n_bc, prob.pinnrep.dtype)
    carry = (theta, opt.init(theta), ada, jnp.asarray(0, jnp.int32))
    key = jax.random.key(0)

    def multi(c, k):
        def body(cc, _):
            return step(cc, k)
        c, (l, _) = jax.lax.scan(body, c, None, length=steps)
        return c, l[-1]

    jm = jax.jit(multi)
    _, l = jm(carry, key)
    float(l)
    t0 = time.perf_counter()
    _, l = jm(carry, key)
    float(l)
    dt = time.perf_counter() - t0
    pps = points * steps / dt

    # --- HLO: fusion instruction -> does its computation contain a dot? ---
    hlo = jm.lower(carry, key).compile().as_text()
    # computation bodies: name -> text
    comp_texts = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"(?:ENTRY )?%?([\w.\-]+) (?:\([^)]*\) -> .*{|\{)", line)
        if m and ("{" in line):
            cur = m.group(1)
            comp_texts[cur] = []
        elif cur is not None:
            comp_texts[cur].append(line)
    # XLA:TPU rewrites dot -> convolution in the optimized HLO
    comp_has_dot = {name: any(re.search(r"\b(dot|convolution)\(", ln)
                              for ln in body)
                    for name, body in comp_texts.items()}
    # fusion instr -> called computation
    fusion_calls = {}
    for m in re.finditer(r"%?([\w.\-]+) = [^\n]*fusion\([^\n]*calls=%?"
                         r"([\w.\-]+)", hlo):
        fusion_calls[m.group(1)] = m.group(2)
    # instruction-level dots/convs outside fusions
    bare_dots = set(m.group(1) for m in re.finditer(
        r"%?([\w.\-]+) = [^\n]* (?:dot|convolution)\(", hlo))

    # --- trace: device events ---
    shutil.rmtree("/tmp/nptrace", ignore_errors=True)
    with jax.profiler.trace("/tmp/nptrace"):
        _, l = jm(carry, key)
        float(l)
    f = sorted(glob.glob("/tmp/nptrace/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(f, "rt") as fh:
        tr = json.load(fh)

    cats = collections.Counter()
    names = collections.defaultdict(float)
    total_dev = 0.0
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        base = name.split("%")[-1]
        if base.startswith("while") or base.startswith("jit_") \
                or base.startswith("$") or "(" in base \
                or base in ("0", "PjitFunction(multi)", "np.asarray(jax.Array)"):
            continue
        dur = e["dur"]  # us
        total_dev += dur
        names[base] += dur
        if base in fusion_calls:
            cat = ("dot_fusion" if comp_has_dot.get(fusion_calls[base], False)
                   else "elementwise_fusion")
        elif base in bare_dots or base.startswith(("dot", "convolution")):
            cat = "dot"
        elif base.startswith(("copy", "transpose", "bitcast", "reshape")):
            cat = "copy/layout"
        elif base.startswith(("reduce", "multiply_reduce", "add_reduce")):
            cat = "reduce"
        elif base.startswith(("rng", "iota")):
            cat = "rng"
        else:
            cat = "other"
        cats[cat] += dur

    print(json.dumps({"tag": tag, "points_per_sec": round(pps, 0),
                      "wall_s": round(dt, 4)}))
    print(f"device op time total: {total_dev/1e3:.2f} ms "
          f"(wall {dt*1e3:.1f} ms)")
    for cat, dur in cats.most_common():
        print(f"  {cat:22s} {dur/1e3:9.2f} ms  {100*dur/total_dev:5.1f}%")
    print("top ops:")
    for name, dur in sorted(names.items(), key=lambda kv: -kv[1])[:15]:
        incat = ("dot" if name in fusion_calls
                 and comp_has_dot.get(fusion_calls[name]) else "")
        print(f"  {dur/1e3:9.2f} ms  {name[:70]} {incat}")


if __name__ == "__main__":
    main()
