"""Benchmark: Vivim training throughput on one TPU chip.

Measures the BASELINE.json north-star config 2: multiclass (3-class) Vivim
(full MiT-b3 + 8 tri-directional MambaLayers, ~60M params), clip_length=5,
image_size=256, train_bs=3 — full jitted train step (recall_focused loss,
AdamW, Pallas selective-scan fwd+bwd) on synthetic data.

Prints TWO JSON lines — a full dump first, then a COMPACT HEADLINE-ONLY
object as the LAST line of stdout (the driver records the tail of stdout;
round 4's artifact lost every headline key because the full dump embedded
a 2KB+ study mid-dict).  Truncating stdout to its last 2KB must always
retain every headline field:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "step_ms": N,
   "noise_band_ms": N, "mfu": N, "value_bs8": N, "canary_matmul_ms": N, ...}
The full dump is also written to docs/bench_full_last.json, and the
batch-scaling study is referenced by path (docs/batch_scaling.json), not
inlined.

ENVIRONMENT-DRIFT CANARY: two fixed micro-workloads (a pinned-shape bf16
matmul and one Pallas selective-scan call), measured under the same
min-of-repeats chained-scan protocol, recorded as ``canary_matmul_ms`` /
``canary_scan_ms`` in every bench JSON.  Read rule (docs/DESIGN.md):
headline deltas across rounds are attributable to the repo ONLY when the
canary is stable; if the canary moved too, the environment moved (the
bs=8 +20% across-day drift, docs/batch_scaling.json remeasured_round4,
cost a day of re-running old commits to diagnose — this makes it one
field-read).

``vs_baseline`` is measured against an ESTIMATED A100 reference throughput
for the PyTorch/CUDA reference at the same config (the reference publishes
no numbers, BASELINE.md): ~12 clips/sec — derived from the reference model's
~1.6 TFLOP/step at fp16 AMP on A100 with typical 35-40% MFU plus CUDA scan
overheads.  vs_baseline > 1.0 means faster than that estimate.

``mfu`` is measured against the XLA cost model's FLOP count for the
compiled train step (jit(...).compile().cost_analysis()["flops"] — an
analytic count of the HLO's matmul/conv/elementwise FLOPs, not a guess)
over the chip's bf16 peak.

THE PINNED PROTOCOL (same for the headline, the bs=8 point, and every
batch_scaling point): chain BENCH_STEPS optimizer steps through the carried
train state inside ONE jitted lax.scan (a single dispatch covers the whole
timed window, so per-step wall time is device time, not tunnel/dispatch
RTT; the final loss value-fetch is the sync), repeat BENCH_REPEATS times
after a warmup dispatch, report min-of-repeats.  ``noise_band_ms`` is
(max - min)/STEPS over those repeats — round-over-round deltas smaller
than this band are not resolvable by this harness.
"""

import functools
import json
import os
import sys
import time

_T0 = time.time()


def _progress(msg):
    """Stage progress to stderr (stdout stays the single JSON line); a
    partially-run bench is then still diagnostic in the driver's tail."""
    print(f"[bench +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr,
          flush=True)

A100_REFERENCE_CLIPS_PER_SEC = 12.0  # estimated; see module docstring

# bf16 peak TFLOP/s by TPU generation (public spec sheets)
PEAK_BF16_TFLOPS = {
    "v5 lite": 197.0,  # v5e
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6 lite": 918.0,  # v6e / Trillium
    "v6e": 918.0,
}

BATCH = int(os.environ.get("BENCH_BATCH", 3))
CLIP_LEN = int(os.environ.get("BENCH_CLIP_LEN", 5))
IMG = int(os.environ.get("BENCH_IMAGE_SIZE", 256))
STEPS = int(os.environ.get("BENCH_STEPS", 30))
REPEATS = int(os.environ.get("BENCH_REPEATS", 5))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")  # bfloat16 (default, matches
# the reference's fp16-AMP training; fp32 scan state preserved) | float32
# BENCH_BS8=0 skips the second (bs=8, throughput-optimal) headline point;
# it only runs when BENCH_BATCH is the default 3, so overriding BENCH_BATCH
# never produces two confusing operating points.
BS8 = int(os.environ.get("BENCH_BS8", "1"))
# Optional stages (bs=8, 512px eval) are skipped when the elapsed wall time
# approaches this budget, so the headline JSON line ALWAYS prints even if
# the driver kills long runs (the round-3 multichip artifact was lost to
# exactly that: rc 124 with all the value stuck behind the timeout).
TIME_BUDGET_S = float(os.environ.get("BENCH_TIME_BUDGET_S", 2400))


def _budget_left(frac):
    """True if less than ``frac`` of the wall budget has been spent."""
    return (time.time() - _T0) < frac * TIME_BUDGET_S


def _peak_tflops() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, val in PEAK_BF16_TFLOPS.items():
        if key in kind:
            return val
    return 197.0  # default to v5e


def _make_batch(jax, jnp, rng, batch_size):
    clip = jax.random.normal(
        rng, (batch_size, CLIP_LEN, IMG, IMG, 3), jnp.float32)
    # synthetic blob masks -> one-hot (B, T, H, W, 3)
    yy, xx = jnp.mgrid[:IMG, :IMG]
    blob = ((yy - IMG // 2) ** 2 + (xx - IMG // 2) ** 2 < (IMG // 4) ** 2)
    labels = jnp.where(blob, 1, 0)[None, None].repeat(batch_size, 0).repeat(
        CLIP_LEN, 1)
    masks = jax.nn.one_hot(labels, 3)
    return {"clip": clip, "masks": masks}


def _measure_train(jax, jnp, loop_lib, model, state, tx, rng, batch_size,
                   grad_accum=1):
    """One pinned-protocol measurement of the full train step at
    ``batch_size``: min-of-REPEATS over a STEPS-long chained lax.scan.

    ONE XLA program per config: the chained scan is AOT-compiled
    (lower().compile()) and its own cost_analysis supplies the per-step
    FLOPs — XLA's cost model counts a while-loop body once regardless of
    trip count (verified: scan(n=1) and scan(n=10) of a 128x128 matmul
    both report 2*128^3 flops), so no separate un-scanned compile is
    needed.  The round-3 bench paid three full compiles per config (init,
    cost-analysis step, chained scan); this pays one, plus a single shared
    init across configs — the state is batch-size-independent.

    Returns ({clips_per_sec, step_ms, noise_band_ms, tflops, mfu},
    final_state) — the caller chains final_state into the next config
    because donation invalidates the input state buffers.
    """
    _progress(f"measure bs={batch_size}: building step")
    batch = _make_batch(jax, jnp, rng, batch_size)
    compute_dtype = jnp.bfloat16 if DTYPE == "bfloat16" else None
    step_fn = loop_lib.make_train_step(model, "recall_focused", 3, tx,
                                       compute_dtype=compute_dtype,
                                       grad_accum=grad_accum)

    # donate the carried train state: without donation XLA double-buffers
    # params+opt state (~0.9 GB at 60M params) — the margin that decides
    # whether bs=16 fits in the 16 GB HBM (batch-scaling study, r3)
    @functools.partial(jax.jit, donate_argnums=0)
    def run_steps(state):
        def body(s, _):
            s, m = step_fn(s, batch)
            return s, m["loss"]
        s, losses = jax.lax.scan(body, state, length=STEPS)
        return s, losses[-1]

    _progress(f"measure bs={batch_size}: compiling chained scan")
    compiled = run_steps.lower(state).compile()
    step_flops = None
    try:
        cost = compiled.cost_analysis()
        if cost and "flops" in cost:
            step_flops = float(cost["flops"])  # per STEP (body counted once)
    except Exception:
        pass

    state, loss = compiled(state)  # warmup dispatch
    _ = float(loss)
    _progress(f"measure bs={batch_size}: timing {REPEATS} repeats")
    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        state, loss = compiled(state)
        _ = float(loss)
        times.append((time.time() - t0) / STEPS)
    dt = min(times)

    res = {
        "clips_per_sec": round(batch_size / dt, 3),
        "step_ms": round(dt * 1e3, 2),
        "noise_band_ms": round((max(times) - min(times)) * 1e3, 2),
    }
    if step_flops is not None:
        res["tflops"] = round(step_flops / 1e12, 3)
        res["mfu"] = round(step_flops / dt / (_peak_tflops() * 1e12), 4)
    return res, state


def _canary(out, jax, jnp):
    """Environment-drift canary: two fixed micro-workloads under the pinned
    protocol (chained in-jit lax.scan, min-of-repeats).  Their shapes never
    change across rounds, so any movement here is the ENVIRONMENT (tunnel /
    host / chip-server), not the repo.  Disable with BENCH_CANARY=0."""
    if not int(os.environ.get("BENCH_CANARY", "1")):
        return
    _progress("canary: matmul")
    n_iter, n_rep = 50, 5
    x = jnp.ones((2048, 2048), jnp.bfloat16)
    w = (jnp.ones((2048, 2048), jnp.bfloat16) * 1e-3)

    @jax.jit
    def mm_chain(x):
        def body(c, _):
            c = jnp.dot(c, w) * (1.0 / 2.048)  # keep magnitudes bounded
            return c, ()
        c, _ = jax.lax.scan(body, x, length=n_iter)
        return c[0, 0]

    _ = float(mm_chain(x))  # compile + warmup
    times = []
    for _i in range(n_rep):
        t0 = time.time()
        _ = float(mm_chain(x))
        times.append((time.time() - t0) / n_iter)
    out["canary_matmul_ms"] = round(min(times) * 1e3, 3)
    out["canary_matmul_noise_band_ms"] = round(
        (max(times) - min(times)) * 1e3, 3)

    _progress("canary: selective scan")
    from vivim_tpu.kernels.selective_scan import selective_scan

    B, L, d, n = 8, 1024, 256, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    u0 = jax.random.normal(ks[0], (B, L, d), jnp.float32)
    delta = 0.1 * jax.random.normal(ks[1], (B, L, d), jnp.float32)
    A = -0.5 - jax.random.uniform(ks[2], (d, n), jnp.float32)
    Bv = jax.random.normal(ks[3], (B, L, n), jnp.float32)
    Cv = jax.random.normal(ks[4], (B, L, n), jnp.float32)
    n_iter_s, n_rep_s = 20, 3

    @jax.jit
    def scan_chain(u):
        def body(c, _):
            y = selective_scan(c, delta, A, Bv, Cv, delta_softplus=True)
            return 0.999 * y, ()
        c, _ = jax.lax.scan(body, u, length=n_iter_s)
        return c[0, 0, 0]

    _ = float(scan_chain(u0))
    times = []
    for _i in range(n_rep_s):
        t0 = time.time()
        _ = float(scan_chain(u0))
        times.append((time.time() - t0) / n_iter_s)
    out["canary_scan_ms"] = round(min(times) * 1e3, 3)
    out["canary_scan_noise_band_ms"] = round(
        (max(times) - min(times)) * 1e3, 3)


# Keys promoted into the compact headline-only LAST stdout line.  Anything
# diagnostic (protocol prose, provenance notes, per-stage tables) stays in
# the full dump (first line + docs/bench_full_last.json).
HEADLINE_KEYS = (
    "metric", "value", "unit", "vs_baseline", "step_ms", "noise_band_ms",
    "model_tflops_per_step", "mfu", "value_bs8", "step_ms_bs8",
    "noise_band_ms_bs8", "mfu_bs8", "canary_matmul_ms", "canary_scan_ms",
    "eval_fps_512px", "eval_fps_512px_noise_band", "eval_fps_512px_int8",
    "loader_fps_bench_host", "loader_fps_idle_host", "loader_fps_warm_cache",
    "loader_fps_warm_pre_resize", "loader_required_frames_per_sec",
    "loader_cores_needed_at_linear_scaling",
    "loader_cores_needed_warm_cache",
    "loader_cores_needed_warm_pre_resize", "host_cpus",
    "batch_scaling_path", "full_dump_path",
)


def _preflight(jax, jnp):
    """Bounded wait for a responsive device before any measurement.

    The axon tunnel can wedge (observed 2026-08-21: a trivial 8x8 fetch
    never returned for >25 min) — without this guard bench.py would block
    forever inside its first device fetch and the round artifact would be
    EMPTY, which is worse than a late or honestly-failed one.  Probes a
    tiny fetch in a daemon thread (the hang is inside a blocking C call,
    so only a thread can bound it), retrying up to BENCH_PREFLIGHT_S
    (default 1800 s).  On success: proceed.  On timeout: print a
    diagnostic compact JSON as the LAST stdout line (so the driver's tail
    capture records WHY there is no headline) and exit 1.
    """
    import threading

    deadline = time.time() + float(os.environ.get("BENCH_PREFLIGHT_S",
                                                  "1800"))
    attempt = 0
    while True:
        attempt += 1
        ok = threading.Event()

        def probe():
            try:
                float(jnp.sum(jnp.ones((8, 8))))
                ok.set()
            except Exception:
                pass  # fall through to retry

        t = threading.Thread(target=probe, daemon=True)
        t.start()
        t.join(timeout=60)
        if ok.is_set():
            if attempt > 1:
                _progress(f"preflight: device responsive after "
                          f"{attempt} probes")
            return
        _progress(f"preflight: device fetch unresponsive "
                  f"(probe {attempt}, {deadline - time.time():.0f}s left)")
        if time.time() >= deadline:
            print(json.dumps({
                "metric": "bench_preflight_failed",
                "value": None,
                "unit": "n/a",
                "error": (
                    f"device fetch unresponsive for "
                    f"{float(os.environ.get('BENCH_PREFLIGHT_S', '1800')):.0f}s "
                    f"({attempt} probes; backend="
                    f"{jax.default_backend()}) — environment outage, "
                    "not a repo regression; re-run when the tunnel "
                    "recovers"),
            }), flush=True)
            sys.stderr.flush()
            # _exit: a daemon thread is still blocked inside the wedged
            # device fetch (a C call); normal interpreter teardown aborts
            # on it (observed SIGABRT "exception not rethrown")
            os._exit(1)
        time.sleep(30)


def main():
    import jax

    # rbg PRNG: dropout-mask generation with threefry is a visible cost on
    # the VPU (profiled ~several ms/step); rbg is the TPU-native generator
    jax.config.update("jax_default_prng_impl", "rbg")
    # persistent compile cache: repeated bench runs skip the ~10 min compile
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_comp_cache"))
    import jax.numpy as jnp

    from vivim_tpu.nn.vivim import Vivim, VivimConfig
    from vivim_tpu.train import loop as loop_lib

    import dataclasses

    from vivim_tpu.nn import segformer as sf

    # production config: tanh GELU (the erf GELU is ~4x slower on the VPU
    # and differs only at the 1e-3 level) — toggle with BENCH_EXACT_GELU=1
    seg = sf.mit_b3()
    if not int(os.environ.get("BENCH_EXACT_GELU", "0")):
        seg = dataclasses.replace(seg, gelu_approximate=True)
    # BENCH_REMAT=1: recompute the Mamba pre-scan chain in the backward
    # (CUDA checkpoint_lvl=1 behavior).  BENCH_REMAT=2: rematerialize whole
    # blocks (MambaLayer + SegformerLayer; save only block inputs) — what
    # bs >= 16 at 256px needs (pre-scan remat alone still exceeds HBM by
    # ~640 MB at bs=16; batch-scaling study, docs/DESIGN.md r3).
    remat_level = int(os.environ.get("BENCH_REMAT", "0"))
    if remat_level >= 2:
        seg = dataclasses.replace(seg, remat_layers=True)
    cfg = VivimConfig(segformer=seg,
                      remat_pre_scan=remat_level == 1,
                      remat_blocks=remat_level >= 2)
    model = Vivim(cfg)
    rng = jax.random.PRNGKey(0)

    # BENCH_GRAD_ACCUM=k: micro-batch accumulation inside the step — the
    # memory-bound alternative to BENCH_REMAT=2 for effective bs>=16
    # (BENCH_BATCH must be divisible by k)
    grad_accum = int(os.environ.get("BENCH_GRAD_ACCUM", "1"))

    # preflight: refuse to hang forever on a wedged device tunnel
    _preflight(jax, jnp)

    # drift canary FIRST: if the headline moved, these two fixed-shape
    # probes say whether the environment moved with it
    canary = {}
    try:
        _canary(canary, jax, jnp)
        _progress(f"canary: {canary}")
    except Exception as e:  # never lose the headline to the canary
        canary["canary_error"] = str(e)[:120]

    # ONE shared init for every config below: params/opt-state do not
    # depend on the batch size, and the bs=1 forward is the cheapest
    # compile that can initialize them.
    _progress("shared init (bs=1 forward compile)")
    # BENCH_BF16_MU=1: AdamW first moment in bf16 (halves mu HBM traffic;
    # perf-lever measurement, docs/DESIGN.md round-3)
    mu_dtype = (jnp.bfloat16 if int(os.environ.get("BENCH_BF16_MU", "0"))
                else None)
    init_clip = jax.random.normal(rng, (1, CLIP_LEN, IMG, IMG, 3),
                                  jnp.float32)
    state, tx = loop_lib.create_train_state(
        model, init_clip, rng, lr=1e-4, weight_decay=1e-2,
        total_steps=1000, mu_dtype=mu_dtype)

    head, head_state = _measure_train(jax, jnp, loop_lib, model, state, tx,
                                      rng, BATCH, grad_accum=grad_accum)

    suffix = "_bf16" if DTYPE == "bfloat16" else ""
    if grad_accum > 1:
        suffix += f"_ga{grad_accum}"
    out = {
        "metric": f"vivim_b3_train_clips_per_sec_chip_bs{BATCH}_"
                  f"clip{CLIP_LEN}_{IMG}px{suffix}",
        "value": head["clips_per_sec"],
        "unit": "clips/sec/chip",
        "vs_baseline": round(head["clips_per_sec"]
                             / A100_REFERENCE_CLIPS_PER_SEC, 3),
        # self-honesty: the denominator is an ESTIMATE, not a measurement —
        # the reference publishes no numbers (BASELINE.md); ~12 clips/s is
        # derived from its FLOP count at typical A100 fp16-AMP MFU.
        "vs_baseline_basis":
            "ESTIMATED A100 reference ~12 clips/s (reference publishes no "
            "numbers; see BASELINE.md) - not a measurement",
        "gelu": ("exact_erf" if int(os.environ.get("BENCH_EXACT_GELU", "0"))
                 else "tanh_approx (production default; diverges from torch "
                      "erf at ~1e-3 - restore with BENCH_EXACT_GELU=1 / "
                      "-exact_gelu true)"),
        "step_ms": head["step_ms"],
        "noise_band_ms": head["noise_band_ms"],
        "bench_protocol": (
            f"min over {REPEATS} repeats of a {STEPS}-step chained "
            f"lax.scan (one dispatch = device time); noise_band_ms is "
            f"max-min over repeats — deltas inside the band are not "
            f"resolvable"),
    }
    if "tflops" in head:
        out["model_tflops_per_step"] = head["tflops"]
        out["mfu"] = head["mfu"]
    out.update(canary)
    out["canary_note"] = (
        "fixed-shape drift probes (2048^2 bf16 matmul chain; Pallas "
        "selective-scan 8x1024x256x16), same min-of-repeats protocol; "
        "read rule: headline deltas across rounds are attributable to the "
        "repo ONLY when the canary is stable (docs/DESIGN.md)")

    # second recorded headline: the throughput-optimal bs=8 operating point
    # (batch-scaling study, docs/DESIGN.md r3), measured live under the SAME
    # pinned protocol.  Disable with BENCH_BS8=0.
    if BS8 and BATCH == 3 and grad_accum == 1 and _budget_left(0.55):
        try:
            bs8, head_state = _measure_train(jax, jnp, loop_lib, model,
                                             head_state, tx, rng, 8)
            out["value_bs8"] = bs8["clips_per_sec"]
            out["step_ms_bs8"] = bs8["step_ms"]
            out["noise_band_ms_bs8"] = bs8["noise_band_ms"]
            if "mfu" in bs8:
                out["mfu_bs8"] = bs8["mfu"]
        except Exception as e:  # never lose the headline to the add-on
            out["value_bs8_error"] = str(e)[:120]
    elif BS8 and BATCH == 3 and grad_accum == 1:
        out["value_bs8_skipped"] = (
            f"wall budget: {time.time() - _T0:.0f}s elapsed of "
            f"BENCH_TIME_BUDGET_S={TIME_BUDGET_S:.0f}")

    # batch-scaling study (round-3): measured clips/s + MFU at bs 3/8/16/32,
    # recorded by scripts via BENCH_BATCH and checked in at
    # docs/batch_scaling.json — referenced by PATH, not inlined (round 4's
    # inlined copy pushed every headline key out of the driver-captured
    # stdout tail).
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "docs", "batch_scaling.json")
    if os.path.exists(scaling_path):
        out["batch_scaling_path"] = "docs/batch_scaling.json"

    # 512px eval forward (the reference's inference resolution;
    # inference.py:414-436 FPS accounting).  Uses the deterministic decode
    # fast path + inference-only scan; disable with BENCH_EVAL_512=0.
    try:
        _bench_eval_512(out, jax, jnp, model, head_state, rng)
    except Exception as e:  # never lose the train metric to the eval add-on
        out["eval_fps_512px_error"] = str(e)[:120]

    try:
        _bench_loader(out)
    except Exception as e:
        out["loader_fps_error"] = str(e)[:120]

    # full dump to a file (diffable, never truncated) + first stdout line;
    # the compact headline-only object is the LAST line so a tail-truncated
    # capture still carries every headline field.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "docs", "bench_full_last.json")
    out["full_dump_path"] = "docs/bench_full_last.json"
    try:
        with open(full_path, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
    except Exception as e:
        out["full_dump_error"] = str(e)[:120]
    _progress("done")
    print(json.dumps(out))
    headline = {k: out[k] for k in HEADLINE_KEYS if k in out}
    # carry error/skip markers so a degraded run is legible from the tail
    headline.update({k: v for k, v in out.items()
                     if k.endswith(("_error", "_skipped"))})
    print(json.dumps(headline))


def _bench_loader(out):
    """Host input-pipeline throughput via the ONE shared harness
    (cli/bench_loader.measure_loader — same synthetic tree, same production
    DataLoader as the standalone tool), single worker so the number is a
    true per-core rate on any host.

    Provenance (round-3 verdict): the live number here is measured on the
    BENCH host while the TPU tunnel + bench process load it
    (``loader_fps_bench_host``); the checked-in idle-host baseline
    (docs/loader_baseline.json) is embedded next to it, and the published
    core requirement derives from the CONSERVATIVE (smaller) of the two.
    Disable with BENCH_LOADER=0."""
    if not int(os.environ.get("BENCH_LOADER", "1")):
        return
    from vivim_tpu.cli.bench_loader import measure_loader, measure_stages

    _progress("loader: measuring")
    res = measure_loader(image_size=IMG, clip_length=CLIP_LEN,
                         num_workers=1, epochs=1)
    out["loader_fps_bench_host"] = res["frames_per_sec"]
    out["loader_fps_bench_host_note"] = (
        "measured on the bench host DURING the bench run (TPU tunnel + "
        "bench process share the host); see loader_fps_idle_host for the "
        "unloaded rate")
    out["host_cpus"] = res["host_cpus"]
    idle_fps = None
    try:
        base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "docs", "loader_baseline.json")
        with open(base_path) as f:
            base = json.load(f)
        idle_fps = float(base["frames_per_sec_per_core_idle_host"])
        out["loader_fps_idle_host"] = idle_fps
        out["loader_fps_idle_host_note"] = (
            f"checked-in baseline ({base['statistic']}, {base['when']}, "
            "docs/loader_baseline.json)")
    except Exception:
        pass
    out["loader_required_frames_per_sec"] = round(
        out["value"] * CLIP_LEN, 1)
    conservative = min(x for x in (res["frames_per_sec"], idle_fps)
                       if x is not None)
    out["loader_cores_needed_at_linear_scaling"] = round(
        out["loader_required_frames_per_sec"] / max(conservative, 1e-9), 1)
    # steady-state (epochs >= 2) rate with the decode cache enabled
    # (-cache_decoded): the warmup epoch fills the cache, the measured
    # epoch skips PNG decode entirely — the loader's single biggest stage
    _progress("loader: measuring warm decode-cache rate")
    warm = measure_loader(image_size=IMG, clip_length=CLIP_LEN,
                          num_workers=1, epochs=1, cache_decoded=True)
    out["loader_fps_warm_cache"] = warm["frames_per_sec"]
    out["loader_fps_warm_cache_note"] = (
        "steady-state epoch with -cache_decoded (warmup epoch fills the "
        "cache; PNG decode skipped), same bench host/protocol as "
        "loader_fps_bench_host")
    out["loader_cores_needed_warm_cache"] = round(
        out["loader_required_frames_per_sec"]
        / max(warm["frames_per_sec"], 1e-9), 1)
    # maximum-throughput mode: cache + augment-at-target-resolution
    # (-cache_decoded -pre_resize; reorders interpolation vs the
    # reference — opt-in, see args.py / README host-pipeline section)
    _progress("loader: measuring warm pre-resize rate")
    fast = measure_loader(image_size=IMG, clip_length=CLIP_LEN,
                          num_workers=1, epochs=1, cache_decoded=True,
                          pre_resize=True)
    out["loader_fps_warm_pre_resize"] = fast["frames_per_sec"]
    out["loader_cores_needed_warm_pre_resize"] = round(
        out["loader_required_frames_per_sec"]
        / max(fast["frames_per_sec"], 1e-9), 1)
    if int(os.environ.get("BENCH_LOADER_STAGES", "0")):
        out["loader_per_stage"] = measure_stages(
            image_size=IMG, clip_length=CLIP_LEN)


def _bench_eval_512(out, jax, jnp, model, state, rng):
    if not int(os.environ.get("BENCH_EVAL_512", "1")):
        return
    if not _budget_left(0.85):
        out["eval_fps_512px_skipped"] = (
            f"wall budget: {time.time() - _T0:.0f}s elapsed of "
            f"BENCH_TIME_BUDGET_S={TIME_BUDGET_S:.0f}")
        return
    from vivim_tpu.train.loop import cast_floating

    ev_bs, ev_img, ev_steps = 1, 512, 5
    compute_dtype = jnp.bfloat16 if DTYPE == "bfloat16" else None
    batch_stats = state.batch_stats
    clip512 = jax.random.normal(
        rng, (ev_bs, CLIP_LEN, ev_img, ev_img, 3),
        compute_dtype or jnp.float32)
    ev_params = (cast_floating(state.params, compute_dtype)
                 if compute_dtype is not None else state.params)

    @jax.jit
    def eval_steps(clip):
        def body(c, _):
            logits = model.apply(
                {"params": ev_params, "batch_stats": batch_stats},
                c, deterministic=True)
            # chain through the input so steps serialize
            c = c + 1e-6 * logits.mean()
            return c, logits[0, 0, 0, 0, 0]
        c, last = jax.lax.scan(body, clip, length=ev_steps)
        return last[-1]

    _progress("eval 512px: compiling")
    _ = float(eval_steps(clip512))
    times = []
    for _ in range(3):
        t0 = time.time()
        _ = float(eval_steps(clip512))
        times.append((time.time() - t0) / ev_steps)
    out["eval_fps_512px"] = round(ev_bs * CLIP_LEN / min(times), 2)
    out["eval_fps_512px_noise_band"] = round(
        ev_bs * CLIP_LEN / min(times) - ev_bs * CLIP_LEN / max(times), 2)


if __name__ == "__main__":
    sys.exit(main())
