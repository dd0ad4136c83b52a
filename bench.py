"""Throughput benchmark — prints ONE JSON line for the driver.

Measures ISTVT forward throughput (6-frame 300x300 clips/sec) on the
available accelerator, the generalization of the reference's timing
harness (reference test_time.py:1-9: 10k bs=1 forwards, wall-clock avg).

Baseline: BASELINE.md targets >=5,000 clips/sec aggregate on a v5e-8
slice, i.e. 625 clips/sec/chip — `vs_baseline` is measured
clips/sec/chip divided by 625.

DEADLINE DEFENSE (the round-3 bench artifact was rc=124: a remote
compile outlived the driver's timeout and the round lost its official
number). Architecture now: a lightweight PARENT process (no jax import)
runs each measurement leg in a CHILD subprocess with a hard kill
timeout, under a global wall-clock budget (env BENCH_BUDGET_S, default
2800 s — every leg budgets a COLD remote compile at r5-measured cost:
anchor ~450-500 s, recipe ~270-430 s, train ~700-900 s, latency
~500 s; the terminal-side compile cache does not persist across
processes, and r4's warm ~30-135 s figures no longer hold). The headline JSON
line prints up to THREE ways: immediately when the anchor completes
(so a driver kill during enrichment can never erase the number — the
driver records stdout even at rc=124), again at the end with
enrichment fields (same headline value), and from a SIGTERM handler
that emits best-so-far or an honest failure if the driver kills the
parent first. Legs in order of decreasing value:

  1. throughput B=16  — the anchor and headline (round-4's official
     315.93 clips/s artifact used it); gets nearly the whole budget —
     a fixed sub-budget cap risks a guaranteed-timeout zero (r5
     shakeout at 420 s, late-r4 shakeout at 300 s).
  2. recipe 224²/d6   — enrichment only (extra.recipe_224_d6_clips_per_sec,
     the composed distilled-student geometry, docs/SERVING.md +
     CERT_RECIPE.json); can never become the headline.
  3. train step B=32 grad_accum=2 — enrichment (VERDICT r4 #5,
     extra.train_clips_per_sec): the ~60 clips/s record in BASELINE.md
     becomes driver-capturable. Reuses cli.bench --train_step (the
     reference's driver is a TRAINING harness, train_CNN.py:495-549).
     Outranks latency (already documented in BENCH_r04); its compile
     is the historical budget-killer so it still follows the recipe
     leg. BENCH_TRAIN=0 disables.
  4. bs=1 latency     — enrichment only; last (known from r4: p50
     28.93 ms tunnel, 5.64 ms device).
  5. throughput B=32  — opt-in (BENCH_TRY_B32=1); upgraded into the
     result only if it beats leg 1.
  A skipped/timed-out leg leaves an honest diagnostic in extra.legs.

The parent prints the best completed result as the FINAL stdout line no
matter which legs died — SIGALRM inside a child is NOT reliable (a
blocked remote-compile RPC holds the interpreter, handlers never run),
so the kill lives in the parent where it always works. A leg that times
out is killed and recorded in extra.legs; it cannot take the JSON line
down with it.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PER_CHIP_BASELINE = 5000.0 / 8.0
REPO = os.path.dirname(os.path.abspath(__file__))


# --------------------------------------------------------------------------
# child: one measurement leg, prints one JSON line, exits
# --------------------------------------------------------------------------

def _child_throughput(batch: int, iters: int,
                      measure_latency: bool = False,
                      size: int = 300, depth: int = 12) -> None:
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp

    from istvt_tpu.core.config import ISTVTConfig
    from istvt_tpu.core import tree as tree_util
    from istvt_tpu.core.platform import enable_compilation_cache
    from istvt_tpu.models import istvt

    enable_compilation_cache()
    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    # The PRODUCTION serving path is int8 W8A8 on the ST-layer GEMMs
    # (kernels/quant.py) — it is the default measurement here, like it
    # would be in deployment: accuracy deltas are asserted by
    # tests/test_quant.py (logits <=5e-2, synthetic AUC delta <0.02) and
    # documented in BASELINE.md. BENCH_DTYPE=bf16 measures the float
    # path. TPU-only either way: off-TPU the q8 kernels never engage.
    quant = os.environ.get("BENCH_DTYPE", "int8") == "int8" \
        and platform == "tpu"

    cfg = ISTVTConfig(use_pallas=platform == "tpu",
                      quantize="int8" if quant else "none",
                      image_size=size, feat_hw=istvt.infer_feat_hw(size),
                      depth=depth)
    rng = jax.random.PRNGKey(0)
    params, state = istvt.init(rng, cfg)
    if platform == "tpu":
        params = tree_util.cast(params, jnp.bfloat16)
    if quant:
        params = istvt.quantize_params(params)

    @jax.jit
    def fwd_n(params, state, clips, n):
        """n chained forwards in ONE device program: every iteration sees
        a DIFFERENT input (i-dependent perturbation) and the returned
        scalar data-depends on every iteration's logits, so nothing can
        be replay-cached or skipped; the tunnel round trip is paid once."""
        def body(i, acc):
            x = clips + 0.01 * (i + 1).astype(clips.dtype)
            logits, _ = istvt.apply(params, state, x, cfg, train=False)
            return acc + jnp.sum(logits.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    clips = jax.random.normal(
        jax.random.PRNGKey(1),
        (batch, cfg.num_frames, cfg.image_size, cfg.image_size, 3),
        dtype)

    # NOTES on honest measurement under remote-tunnel backends:
    # (a) every timed call uses a DIFFERENT input — byte-identical
    # requests can be replay-cached; (b) block_until_ready may return
    # before remote execution finishes, so the timed region ends by
    # FETCHING a scalar that data-depends on EVERY iteration's output;
    # (c) iterations are chained WITHOUT intermediate fetches so the
    # ~33 ms tunnel round trip is paid once, not per iteration.
    salt = jnp.asarray((time.time() % 997) / 1e4, dtype)
    clips = clips + salt
    float(fwd_n(params, state, clips, 1))  # compile + warmup
    t0 = time.perf_counter()
    float(fwd_n(params, state, clips, iters))
    dt = (time.perf_counter() - t0) / iters

    out = {
        "clips_per_sec": round(batch / dt, 2),
        "per_clip_ms": round(dt * 1000.0 / batch, 3),
        "platform": platform,
        "batch": batch,
        "image_size": size,
        "depth": depth,
        "iters": iters,
        "dtype": "int8_w8a8" if quant else
                 str(dtype.__name__ if hasattr(dtype, "__name__")
                     else dtype),
    }
    if measure_latency and batch == 1:
        # true single-clip p50 latency (includes the tunnel round trip,
        # what a caller sees); device_ms = chained forwards in one call
        # so the fixed per-call cost is paid once. Explicitly flagged:
        # when bs=1 is the THROUGHPUT anchor (CPU plan / BENCH_BATCH=1)
        # these ~21 extra forwards would burn the anchor's budget and
        # the parent drops the fields anyway.
        lat = []
        for i in range(5):
            t0 = time.perf_counter()
            float(fwd_n(params, state, clips + 0.01 * (i + 1), 1))
            lat.append(time.perf_counter() - t0)
        lat.sort()
        out["p50_latency_ms_bs1"] = round(lat[len(lat) // 2] * 1000.0, 2)
        t0 = time.perf_counter()
        float(fwd_n(params, state, clips, 16))
        out["device_ms_bs1"] = round(
            (time.perf_counter() - t0) / 16 * 1000.0, 2)
    print(json.dumps(out), flush=True)


# --------------------------------------------------------------------------
# parent: schedule legs under the budget, always print one line
# --------------------------------------------------------------------------

def _run_leg(args: list[str], timeout_s: float) -> tuple[dict | None, str]:
    """Run one child leg; returns (parsed JSON dict or None, reason)."""
    if timeout_s < 30:
        return None, "no_budget"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *args],
            capture_output=True, text=True, timeout=timeout_s, cwd=REPO)
    except subprocess.TimeoutExpired:
        return None, f"timeout_{int(timeout_s)}s"
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-1:]
        return None, f"rc{proc.returncode}:{tail[0][:120] if tail else ''}"
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line), "ok"
            except json.JSONDecodeError:
                continue
    return None, "no_json"


def main() -> None:
    if "--leg-train" in sys.argv:
        i = sys.argv.index("--leg-train")
        batch, accum, iters = (int(sys.argv[i + 1]), int(sys.argv[i + 2]),
                               int(sys.argv[i + 3]))
        size = sys.argv[sys.argv.index("--size") + 1] \
            if "--size" in sys.argv else "300"
        depth = sys.argv[sys.argv.index("--depth") + 1] \
            if "--depth" in sys.argv else "12"
        sys.path.insert(0, REPO)
        from istvt_tpu.cli import bench as cli_bench
        cli_bench.main(["-mn", "istvt", "-bs", str(batch),
                        "--grad_accum", str(accum), "--train_step",
                        "--iters", str(iters), "-is", size,
                        "--depth", depth])
        return
    if "--leg" in sys.argv:
        i = sys.argv.index("--leg")
        batch = int(sys.argv[i + 1])
        iters = int(sys.argv[i + 2])
        size = int(sys.argv[sys.argv.index("--size") + 1]) \
            if "--size" in sys.argv else 300
        depth = int(sys.argv[sys.argv.index("--depth") + 1]) \
            if "--depth" in sys.argv else 12
        _child_throughput(batch, iters,
                          measure_latency="--lat" in sys.argv,
                          size=size, depth=depth)
        return

    # default sized so all four legs fit at COLD-compile cost (~500 +
    # 320 + 600 + 500); a driver that kills sooner still gets the
    # headline via the early print / SIGTERM handler, so a large budget
    # only ever ADDS enrichment fields.
    budget = float(os.environ.get("BENCH_BUDGET_S", "2800"))
    deadline = time.monotonic() + budget

    def remaining() -> float:
        return deadline - time.monotonic()

    legs: dict[str, str] = {}
    best: dict | None = None

    def result_line(extra_fields=None):
        cps = best["clips_per_sec"]
        r = {
            "metric": "istvt_fwd_clips_per_sec_per_chip",
            "value": cps,
            "unit": "clips/s",
            "vs_baseline": round(cps / PER_CHIP_BASELINE, 4),
            "extra": {
                "platform": best["platform"],
                "batch": best["batch"],
                "iters": best["iters"],
                "dtype": best["dtype"],
                "per_clip_ms": best["per_clip_ms"],
                "legs": dict(legs),
            },
        }
        r["extra"].update(extra_fields or {})
        return r

    # The driver may SIGTERM this parent before our own deadline (that
    # is how the r3 number died at rc=124). Print a parseable line —
    # best-so-far or an honest failure — before going down, so NO
    # driver timeout can erase the round's number. (A child leg left
    # running becomes an orphan that exits on its own kill-timeout.)
    def _sigterm(_sig, _frm):
        if best is not None:
            print(json.dumps(result_line()), flush=True)
        else:
            print(json.dumps({
                "metric": "istvt_fwd_clips_per_sec_per_chip",
                "value": 0.0, "unit": "clips/s", "vs_baseline": 0.0,
                "extra": {"error": "killed before any leg completed",
                          "legs": dict(legs), "budget_s": budget},
            }), flush=True)
        os._exit(0)

    import signal
    signal.signal(signal.SIGTERM, _sigterm)

    # platform probe in a child (importing jax in the parent would let a
    # hung tunnel handshake take the whole bench down). A FAILED probe
    # (timeout/crash) is treated as TPU: on the driver's real chip a
    # transient tunnel stall must not silently downgrade the official
    # number to the bs=1 CPU plan (~40 clips/s with an 'ok' marker) —
    # the B=16 anchor self-times-out safely if the stall persists.
    probe_status = "failed"
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True,
            timeout=min(120.0, max(30.0, remaining() / 4)), cwd=REPO)
        if probe.returncode == 0 and probe.stdout.strip():
            probe_status = probe.stdout.strip().splitlines()[-1]
    except (subprocess.TimeoutExpired, OSError):
        pass
    if probe_status != "tpu":
        legs["probe"] = probe_status

    batch_env = os.environ.get("BENCH_BATCH")
    iters = int(os.environ.get("BENCH_ITERS", "32"))

    if batch_env is not None:
        plan = [(int(batch_env), iters)]
    elif probe_status in ("tpu", "failed"):
        # B=16 int8 is the safety anchor AND the measured best (315.4
        # clips/s driver-style capture, r4): B=32 measured no faster
        # after the r3 kernel work and its compile is the known
        # budget-killer, so it is opt-in via BENCH_TRY_B32=1 and runs
        # LAST, after the latency enrichment is already secured.
        plan = [(16, iters)]
        if os.environ.get("BENCH_TRY_B32", "0") == "1":
            plan.append((32, iters))
    else:
        plan = [(1, 2)]

    def try_leg(batch, n_iters, cap=None):
        nonlocal best
        cap = (remaining() - 15) if cap is None else min(cap,
                                                         remaining() - 15)
        r, why = _run_leg(["--leg", str(batch), str(n_iters)], cap)
        key = f"b{batch}"
        legs[key] = why if key not in legs else legs[key] + ";" + why
        if r is not None and (best is None
                              or r["clips_per_sec"] > best["clips_per_sec"]):
            best = r
        return r is not None

    # anchor leg gets (nearly) the WHOLE budget: the 300² int8 remote
    # compile alone measured ~430-470 s in r5 (~325 s in r4 — it
    # drifts), so any fixed sub-budget cap risks a guaranteed timeout
    # that zeroes the round (that exact failure: a 420 s cap in the r5
    # shakeout, a 300 s cap late in r4). The NUMBER matters more than
    # any enrichment leg, and the early print below secures it the
    # moment the leg lands. A fast crash still leaves budget for ONE
    # retry; a timeout consumed the budget anyway.
    if not try_leg(*plan[0]) and remaining() > 140:
        try_leg(*plan[0])

    # print the headline IMMEDIATELY once the anchor is in: the driver
    # records stdout even when it kills a run (r3's artifact captured
    # the tail at rc=124), so a number secured here survives the driver
    # timing out the enrichment legs below. The final print repeats the
    # SAME value with enrichment fields — whichever line a parser takes,
    # the headline is identical.
    if best is not None:
        print(json.dumps(result_line()), flush=True)

    # composed-recipe enrichment FIRST (docs/SERVING.md "Composed
    # recipe"): the 224²/depth-6 distilled-student geometry, extra-only
    # — it can NEVER become the headline value (that stays the exact
    # paper formulation). Its compile is small (~30 s measured); on a
    # slow-tunnel day it is the one enrichment worth the budget.
    # Accuracy contract for this geometry: CERT_RECIPE.json, produced by
    # `python -m istvt_tpu.cli.certify` (disjoint-val AUC + int8 parity
    # + LRP localization of the distilled int8 student; the same chain
    # runs at toy geometry in tests/test_certify.py).
    # per-leg caps sized for COLD remote compiles: r5 measured ~430-470s
    # for the 300² anchor program and >170s even for the small 224²/d6
    # one — the terminal-side compile cache does NOT persist across
    # processes (two identical back-to-back legs each paid ~450s), so
    # every leg must budget a full compile, not r4's warm ~30s.
    rec = None
    if (best is not None and best.get("platform") == "tpu"
            and os.environ.get("BENCH_RECIPE", "1") == "1"
            and remaining() > 140):
        rec, why = _run_leg(["--leg", "16", str(iters), "--size", "224",
                             "--depth", "6"],
                            min(remaining() - 15, 600))
        legs["recipe_224_d6"] = why

    # train-step enrichment (VERDICT r4 #5) OUTRANKS latency: B=32
    # grad_accum=2 is the measured-best training config (~60 clips/s,
    # BASELINE.md) and has never been driver-captured, while bs=1
    # latency is already documented in BENCH_r04. Its compile is the
    # historical budget-killer — kill-timeout subprocess like the rest.
    trn = None
    if (best is not None and best.get("platform") == "tpu"
            and os.environ.get("BENCH_TRAIN", "1") == "1"):
        if remaining() > 200:
            trn, why = _run_leg(["--leg-train", "32", "2", "4"],
                                min(remaining() - 15, 900))
        else:
            why = "skipped_budget"
        legs["train_b32_accum2"] = why

    lat = None
    if (best is not None and best.get("batch", 1) > 1
            and os.environ.get("BENCH_LATENCY", "1") == "1"
            and remaining() > 140):
        lat, why = _run_leg(["--leg", "1", "4", "--lat"],
                            min(remaining() - 15, 600))
        legs["b1_latency"] = why

    for batch, n_iters in plan[1:]:
        try_leg(batch, n_iters)

    if best is None:
        # nothing completed: emit an honest failure line (still valid
        # JSON so the driver records *something* parseable).
        print(json.dumps({
            "metric": "istvt_fwd_clips_per_sec_per_chip",
            "value": 0.0,
            "unit": "clips/s",
            "vs_baseline": 0.0,
            "extra": {"error": "all bench legs timed out", "legs": legs,
                      "budget_s": budget},
        }))
        sys.exit(0)

    enrich = {}
    if lat is not None:
        enrich["p50_latency_ms_bs1"] = lat.get("p50_latency_ms_bs1")
        enrich["device_ms_bs1"] = lat.get("device_ms_bs1")
    if rec is not None:
        enrich["recipe_224_d6_clips_per_sec"] = rec["clips_per_sec"]
    if trn is not None:
        enrich["train_clips_per_sec"] = trn.get("items_per_sec")
        enrich["train_step_ms"] = trn.get("mean_ms")
        enrich["train_batch"] = trn.get("batch")
        enrich["train_grad_accum"] = trn.get("grad_accum")
    print(json.dumps(result_line(enrich)))


if __name__ == "__main__":
    main()
