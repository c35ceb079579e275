"""Count post-optimization HLO instructions (~= kernel dispatches) in the
physics step, attributed to source files via fusion-body metadata.

On the axon relay every non-trivial instruction in the optimized entry
computation is roughly one device dispatch (fusions count once).
Conditionals execute ONE branch at runtime, so the count descends into the
MAX branch; while bodies are counted once (steady-state trip counts are
printed separately so hot-loop cost can be multiplied by trips).

Usage:
  JAX_PLATFORMS=cpu python scripts/kernel_count.py   # CPU lowering (jnp paths)
  python scripts/kernel_count.py                     # TPU lowering via the
                                                     # relay (Pallas paths on)
Env: BENCH_BODIES (default 10000).
"""
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import edyn_tpu as et
from edyn_tpu.utils import scenes
from edyn_tpu.simulation.stepper import physics_step_impl

N = int(os.environ.get("BENCH_BODIES", 10_000))

SKIP = ("parameter", "constant", "tuple", "get-tuple-element", "bitcast",
        "copy-start", "copy-done", "async-start", "async-done",
        "async-update", "copy")


def parse(txt):
    comps = {}
    cur = None
    for ln in txt.splitlines():
        if ln.startswith("}"):
            cur = None
            continue
        m = re.match(r"^(ENTRY )?%?([\w\.\-]+) \(.*\{", ln)
        if m:
            cur = m.group(2)
            comps[cur] = {"entry": bool(m.group(1)), "instrs": []}
            continue
        if cur is None:
            continue
        ls = ln.strip()
        m2 = re.match(r"%?([\w\.\-]+) = \S+.*? ([\w\-]+)\(", ls)
        if m2:
            comps[cur]["instrs"].append((m2.group(2), ls))
    return comps


def called(ls):
    out = []
    for key in ("calls=", "to_apply=", "body=", "condition="):
        m = re.search(re.escape(key) + r"%?([\w\.\-]+)", ls)
        if m:
            out.append(m.group(1))
    m = re.search(r"branch_computations=\{([^}]*)\}", ls)
    if m:
        out += [x.strip().lstrip("%") for x in m.group(1).split(",")]
    return out


def srcs_of(comps, cname):
    c = collections.Counter()
    for op, ls in comps.get(cname, {"instrs": []})["instrs"]:
        fm = re.search(r'source_file="([^"]*)"', ls)
        if fm:
            c[fm.group(1).split("/")[-1]] += 1
    return c


def count_comp(comps, cname, agg, whiles, depth=0):
    total = 0
    for op, ls in comps.get(cname, {"instrs": []})["instrs"]:
        if op in SKIP:
            continue
        if op == "fusion":
            cs = called(ls)
            sc = srcs_of(comps, cs[0]) if cs else None
            f = sc.most_common(1)[0][0] if sc else "?"
            agg[f] += 1
            total += 1
        elif op == "conditional":
            brs = called(ls)
            best, bestn, bestagg, bestw = None, -1, None, None
            for b in brs:
                sub = collections.Counter()
                subw = []
                n = count_comp(comps, b, sub, subw, depth + 1)
                if n > bestn:
                    best, bestn, bestagg, bestw = b, n, sub, subw
            agg.update(bestagg)
            whiles.extend(bestw)
            total += bestn
        elif op == "while":
            cs = called(ls)
            body = cs[0] if cs else None
            sub = collections.Counter()
            n = count_comp(comps, body, sub, whiles, depth + 1) if body else 0
            agg.update(sub)
            whiles.append((body, n, sub.most_common(3)))
            total += n
        elif op == "call":
            cs = called(ls)
            total += count_comp(comps, cs[0], agg, whiles, depth + 1) \
                if cs else 0
        else:
            fm = re.search(r'source_file="([^"]*)"', ls)
            f = (fm.group(1).split("/")[-1] + ":" + op) if fm else op
            agg[f] += 1
            total += 1
    return total


def main():
    print(f"backend: {jax.default_backend()}, bodies: {N}")
    builder, _ = scenes.mixed_pile(n_bodies=N)
    world = et.make_world(builder, et.Settings())
    lowered = jax.jit(physics_step_impl,
                      static_argnames=("settings", "meta")).lower(
        world.state, world.settings, world.meta)
    compiled = lowered.compile()
    comps = parse(compiled.as_text())
    entry = [k for k, v in comps.items() if v["entry"]][0]
    agg = collections.Counter()
    whiles = []
    total = count_comp(comps, entry, agg, whiles)
    print(f"\nTOTAL dispatch-equivalent instructions "
          f"(cond = max branch, while bodies ONCE): {total}")
    print("\n-- by source file / op --")
    for k, v in agg.most_common(40):
        print(f"{v:6d}  {k}")
    print("\n-- while bodies (dispatch per trip; multiply by trips) --")
    for body, n, top in whiles:
        print(f"  {n:4d} instrs  {body}  {top}")


if __name__ == "__main__":
    main()
