"""Profile the flagship train step on TPU and print a per-HLO cost table.

Captures a ``jax.profiler`` trace of the jitted VisCoIN train step (the
bench.py configuration) through the relay-attached device, then parses the
``plugins/profile/*/vm.trace.json.gz`` device timeline (per-HLO durations;
client-side XLA flags cannot reach the relay compiler, but the profiler
works — CLAUDE.md).

Usage::

    python scripts/profile_step.py [batch] [--out /tmp/vtrace]

Prints the top HLOs by total device time, grouped by fusion/op name, plus a
rollup by named scope (synthetic_samples / classifier_f / psi_theta /
gan_reconstruction / classifier_f_rebuilt / lpips ...).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys


def capture(batch: int, out_dir: str) -> None:
    import numpy as np
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax_comp_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    step, sample_fakes, state, frozen, cfg = bench.build(batch)
    from viscoin_tpu.train.viscoin import fake_sample_keys
    K = max(1, cfg.fake_presample_steps)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 200, batch).astype(np.int32))

    def fakes_for(i):
        return sample_fakes(frozen, fake_sample_keys(jax.random.PRNGKey(0), i, K))

    def sync(m):
        return float(m["total_loss"])

    fake_group = fakes_for(0)
    state, metrics = step(state, frozen, images, labels, jax.random.PRNGKey(0),
                          fake_group[0])
    sync(metrics)
    state, metrics = step(state, frozen, images, labels, jax.random.PRNGKey(1),
                          fake_group[1 % K])
    sync(metrics)

    jax.profiler.start_trace(out_dir)
    for i in range(3):  # 3 steps + their sampler calls in the trace
        if i % K == 0:
            fake_group = fakes_for(2 + i)
        state, metrics = step(state, frozen, images, labels,
                              jax.random.PRNGKey(2 + i), fake_group[i % K])
    sync(metrics)
    jax.profiler.stop_trace()


def load_events(out_dir: str) -> tuple[list[dict], list[dict]]:
    """Return (per-HLO device events, program-instance module spans).

    Prefers the DEVICE timeline (vm.trace.json.gz through the relay);
    jax.profiler also writes a <hostname>.trace.json.gz HOST trace next to
    it, and analyzing that one would sum host-side TraceMe events into a
    meaningless "device" table."""
    paths = sorted(glob.glob(os.path.join(out_dir, "plugins/profile/*/vm.trace.json.gz")))
    if not paths:
        paths = sorted(glob.glob(os.path.join(out_dir, "plugins/profile/*/*trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace under {out_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # The combined trace interleaves device and host tracks; keep only the
    # per-HLO device lane (process "/device:*", thread "XLA Ops") — summing
    # everything would double-count jit spans, step markers, and host
    # TraceMes into a meaningless table. The sibling "XLA Modules" lane
    # carries one span per PROGRAM INSTANCE (jit_train_step, the sampler,
    # eval...) — kept separately so HLO time can be attributed per program:
    # fusion NAMES repeat across programs, so a name-grouped table alone
    # conflates e.g. the step's conv fusions with the sampler's.
    device_pids, xla_ops_tids, module_tids = set(), set(), set()
    for e in events:
        if e.get("ph") != "M":
            continue
        if (e.get("name") == "process_name"
                and str(e.get("args", {}).get("name", "")).startswith("/device:")):
            device_pids.add(e.get("pid"))
        if e.get("name") == "thread_name":
            lane = e.get("args", {}).get("name")
            if lane == "XLA Ops":
                xla_ops_tids.add((e.get("pid"), e.get("tid")))
            elif lane == "XLA Modules":
                module_tids.add((e.get("pid"), e.get("tid")))
    keep = {(p, t) for p, t in xla_ops_tids if p in device_pids}
    mkeep = {(p, t) for p, t in module_tids if p in device_pids}
    modules = [e for e in events
               if (e.get("pid"), e.get("tid")) in mkeep
               and e.get("ph") == "X" and "dur" in e]
    if keep:
        events = [e for e in events
                  if (e.get("pid"), e.get("tid")) in keep or e.get("ph") == "M"]
    elif device_pids:
        # Device processes exist but no "XLA Ops" thread under them
        # (profiler-version-dependent naming) — analyze unfiltered rather
        # than silently reporting an empty 0-ms table.
        print("WARNING: no 'XLA Ops' device lane found; analyzing the "
              "UNFILTERED trace (host spans included)")
    return events, modules


def _program_of(modules: list[tuple[float, float, str]], ts: float) -> str:
    """Program-instance span enclosing device timestamp ts (spans are
    disjoint on the one device timeline; linear scan over ~10s of spans)."""
    for start, end, name in modules:
        if start <= ts <= end:
            return name
    return "(outside any program)"


def analyze(out_dir: str, steps: int = 3) -> None:
    events, module_events = load_events(out_dir)
    # Module spans, normalized to (start, end, program_name) with the
    # instance id stripped: "jit_train_step(123...)" -> "jit_train_step".
    spans = sorted(
        (e["ts"], e["ts"] + e["dur"], re.sub(r"\(\d+\)$", "", e.get("name", "?")))
        for e in module_events
    )
    durs: dict[str, float] = {}
    prog_durs: dict[tuple[str, str], float] = {}
    prog_total: dict[str, float] = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "?")
        durs[name] = durs.get(name, 0.0) + e["dur"]
        prog = _program_of(spans, e.get("ts", -1.0)) if spans else "?"
        prog_durs[(prog, name)] = prog_durs.get((prog, name), 0.0) + e["dur"]
        prog_total[prog] = prog_total.get(prog, 0.0) + e["dur"]

    total = sum(durs.values())
    print(f"device total: {total / 1e3 / steps:.2f} ms/step over {steps} steps")
    if prog_total:
        print("by program (HLO time inside each program's instances):")
        for prog, d in sorted(prog_total.items(), key=lambda kv: -kv[1]):
            print(f"  {d / 1e3 / steps:9.3f} ms/step  {prog}")
    print()

    # Per-(program, fusion) table — names repeat ACROSS programs, so the
    # program column is what keeps step vs sampler instances separate.
    print(f"{'ms/step':>9}  {'%':>5}  program :: name")
    for (prog, name), d in sorted(prog_durs.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{d / 1e3 / steps:9.3f}  {100 * d / total:5.1f}  "
              f"{prog} :: {name[:90]}")

    # Rollup by op category.
    cats: dict[str, float] = {}
    for name, d in durs.items():
        m = re.match(r"(%?)([a-zA-Z0-9_-]+?)(\.\d+)?$", name.split(" ")[0])
        base = m.group(2) if m else name
        base = re.sub(r"\d+$", "", base)
        cats[base] = cats.get(base, 0.0) + d
    print("\nby op family:")
    for name, d in sorted(cats.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{d / 1e3 / steps:9.3f}  {100 * d / total:5.1f}  {name}")


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 64
    out = "/tmp/vtrace"
    if "--out" in sys.argv:
        idx = sys.argv.index("--out")
        if idx + 1 >= len(sys.argv):
            raise SystemExit("usage: profile_step.py [batch] --out <dir>")
        out = sys.argv[idx + 1]
    if "--analyze-only" not in sys.argv:
        capture(batch, out)
    analyze(out)
