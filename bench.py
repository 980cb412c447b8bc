"""Benchmark: NYUv2 fusion-level DynMM (SkipGateESANet R34-NBt1D, 480×640)
inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N,
   "series": {...stable keys, same names every round...}, ...}

value        = bs=8 SERVING throughput: bf16 activations (the shipped
               serving dtype — selections identical to the fp32 oracle and
               drift bounded, tests/test_torch_oracle.py +
               tests/test_routed_compact.py), PER-SAMPLE bucket-compacted
               routing (``forward_routed_compact``) with the TRAINED gate
               committed at bench_assets/gate_trained.msgpack, fed
               HOST-PACKED space-to-depth stem inputs (the serving
               preprocessing fast path, ``resnet.space_to_depth_host`` —
               bit-equal outputs, tests/test_stem_lowering.py), timed on a
               mixed eval batch (half informative depth, half near-zero) so
               the gate routes input-dependently within every batch.
vs_baseline  = value / static dense fp32 baseline (always-fuse, no gate —
               the reference's ESANet compute in the reference's dtype)
               measured interleaved in the same process. The reference
               publishes no throughput numbers (SURVEY §6), so the static
               model on identical hardware is the baseline.

``series`` carries the STABLE per-round contract (VERDICT r2 item 4):
dense fp32 / dense bf16 / routed fp32 / routed bf16 / batch-max fps, the
same-dtype routed-vs-dense ratio (the honest R34 mixed-batch footnote:
fusion-level routing cannot beat dense on THIS arch at fp32 — the skippable
depth encoder costs less wall time than the gate, docs/DESIGN.md), per-path
forced fps, the 4k-matmul TFLOP/s contention anchor, and train-step
samples/s (fwd+bwd+SGD). ``r50_routing`` (the reference's own ResNet50
config, where fusion-level routing WINS on-chip) now runs by default;
``modality_routing`` covers the MOSEI/IMDB routers at serving batch.

Timing methodology: this environment reaches the TPU through a high-latency
tunnel where per-call host timing is meaningless, so each measurement runs
N iterations *inside one jit* via ``lax.scan`` (iterations chained through a
data dependency so XLA cannot hoist the body) and reads back one scalar; a
no-op jit call of the same arity calibrates the fixed round-trip overhead.
Candidates are measured INTERLEAVED round-robin with medians so the ~1.5×
chip/tunnel contention drift cancels in every reported ratio; the matmul
anchor quantifies the window's absolute contention.

Extra diagnostics (bs=1 switch latency) go to stderr with BENCH_FULL=1;
stdout stays one JSON line.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

SCAN_ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "10"))
N_BATCHES = 16
BS = 8


def setup_compilation_cache():
    """Persist compiled programs across bench runs (first compile of the
    bucket-switch graphs is minutes; later runs are instant)."""
    from dynmm_tpu.utils.platform import setup_compilation_cache as _setup

    _setup()


class _SkipDiagnostics(Exception):
    pass


def log(msg: str):
    print(msg, file=sys.stderr, flush=True)


def make_scan_bench(apply_fn):
    """Wrap apply_fn(variables, rgb, depth)->logits in an N-iteration scan
    with an artificial data dependency; returns jitted fn -> scalar.

    The carry is a SCALAR perturbation of the input, not the input array
    itself: carrying the 39 MB rgb buffer inflated routed-graph times by
    several ms (buffer copies per iteration)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(variables, rgb, depth):
        def body(c, _):
            # perturb EVERY input a candidate might ignore (depth too —
            # routed graphs can skip all depth stages and XLA would hoist
            # the depth-only subgraphs out of the scan otherwise)
            out = apply_fn(variables, rgb + c,
                           depth + c if depth is not None else None)
            probe = out[(0,) * out.ndim]  # rank-generic first element
            return (1e-30 * jnp.sum(probe)).astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=SCAN_ITERS)
        return c

    return run


def measure_matmul_anchor():
    """4096³ matmul-chain TFLOP/s (fp32, bf16) — the contention anchor: v5e
    peak-consistent values are ~169 / ~206 (docs/DESIGN.md); lower readings
    quantify how contended this measurement window was."""
    import jax
    import jax.numpy as jnp

    # 40 chained matmuls ≈ 30 ms/call on-chip: long enough that the tunnel's
    # ±ms calibration noise can't produce super-peak readings (iters=10 gave
    # 297 TFLOP/s fp32 — impossible on v5e)
    n, iters = 4096, 40
    x32 = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, n)).astype(np.float32))

    def mk(x):
        @jax.jit
        def run(x):
            def body(c, _):
                return jnp.tanh(c @ x), ()
            c, _ = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(c[0, 0])
        return run

    @jax.jit
    def nop(x):
        return jnp.sum(x[0, 0])

    out = {}
    for name, x in (("fp32", x32), ("bf16", x32.astype(jnp.bfloat16))):
        t = measure(mk(x), nop, x, reps=3, iters=iters)
        out[name] = round(2 * n**3 / t / 1e12, 1)
        log(f"matmul anchor {name}: {out[name]} TFLOP/s")
    return out


def measure_train_step(dtype: str = "float32"):
    """Full training-step throughput (fwd+bwd+SGD, multi-scale loss, soft
    gate — the reference's training regime) in samples/s, scan-timed with
    the state carried through the scan (tools/perf_train.py folded in).
    ``dtype='bfloat16'`` benches mixed-precision training (bf16 compute,
    fp32 params/optimizer — flax dtype semantics)."""
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.cli.seg_args import ArgumentParserRGBDSegmentation
    from dynmm_tpu.cli.seg_build import build_model
    from dynmm_tpu.train.seg import SegTrainConfig, SegTrainer

    iters = 4
    parser = ArgumentParserRGBDSegmentation()
    parser.set_common_args()
    args = parser.parse_args([
        "--dataset", "synthetic", "--height", "480", "--width", "640",
        "--batch_size", str(BS), "--dynamic", "--global-gate",
        "--loss-ratio", "1e-4", "--dtype", dtype,
    ])
    model = build_model(args, 40)
    cfg = SegTrainConfig(batch_size=BS, loss_ratio=1e-4, dynamic=True,
                         global_gate=True)
    trainer = SegTrainer(model, cfg, np.ones(40, np.float32))

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.standard_normal((BS, 480, 640, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.standard_normal((BS, 480, 640, 1)).astype(np.float32))
    targets = [jnp.asarray(rng.integers(0, 41, (BS, 480 // r, 640 // r))
                           .astype(np.int32)) for r in (1, 8, 16, 32)]
    state = trainer.init_state(
        jax.random.PRNGKey(0),
        {"image": np.asarray(image), "depth": np.asarray(depth)})
    step = trainer._get_train_step((False, False, False))

    @jax.jit
    def run(state, image, depth, *targets):
        def body(carry, _):
            st, rng = carry
            rng, sub = jax.random.split(rng)
            st, total, _ps, _lf = step(
                st, image, depth, list(targets), 1e-3, 1.0, sub)
            return (st, rng), total
        (_, _), totals = jax.lax.scan(
            body, (state, jax.random.PRNGKey(1)), None, length=iters)
        return totals[-1]

    @jax.jit
    def nop(state, image, depth, *targets):
        return jnp.sum(image[0, 0, 0])

    t = measure(run, nop, state, image, depth, *targets, reps=3, iters=iters)
    log(f"train step: {t*1e3:.1f} ms/step ({BS/t:.1f} samples/s)")
    return round(BS / t, 2)


def make_stream_bench(apply_fn, n_batches):
    """Scan over a STREAM of distinct batches (n_batches, bs, H, W, C): each
    iteration routes its own batch, so gate decisions / bucket sizes vary."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(variables, rgbs, depths):
        def body(carry, xb):
            rgb, depth = xb
            out = apply_fn(variables, rgb + carry, depth)
            return 1e-30 * jnp.mean(out), ()
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), (rgbs, depths))
        return carry

    return run


def measure(run, nop, *args, reps: int = 3, iters: int | None = None) -> float:
    """Seconds per iteration, overhead-corrected, best of ``reps``."""
    iters = iters if iters is not None else SCAN_ITERS
    float(run(*args))  # compile + warm
    float(nop(*args))
    totals, overheads = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args))
        totals.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(nop(*args))
        overheads.append(time.perf_counter() - t0)
    # min(total) − min(overhead), NOT min(total − overhead): the paired
    # subtraction lets a single inflated nop reading bias the best rep low
    # (observed: impossible 342 TFLOP/s bf16 anchor readings). The minima
    # are each the least-contended estimate of their own quantity.
    return max(min(totals) - min(overheads), 1e-9) / iters


def measure_interleaved(runs: dict, nop, *args, rounds: int = 5,
                        iters: int | None = None,
                        args_map: dict | None = None,
                        estimator: str = "median") -> dict:
    """{name: sec_per_iter} with reps round-robined across all
    candidates — chip/tunnel contention drifts on second scales, so
    back-to-back sequential reps bias ratios (observed: dense caught a
    quiet window and the routed/dense ratio swung 0.70→0.85).

    ``args_map`` optionally overrides the positional args per candidate
    (e.g. space-to-depth pre-packed inputs for ``*_packed`` candidates) so
    differently-fed candidates still share one interleave set.

    ``estimator``: "median" = median over reps of the paired
    (total − overhead) diff — the long-standing trend-series estimator.
    "minfloor" = (min(total) − min(overhead)) per candidate — host
    dispatch noise is strictly additive on this 1-core host, so the min
    over reps is the noise-floor estimate of the true per-call time
    (CLAUDE.md measure() note: subtracting mins separately avoids one
    inflated nop rep biasing the paired form low). Device-timeline traces
    are bit-repeatable (±2 µs) while the paired-median wall wobbled
    ±0.4 ms/iter across whole-bench runs; minfloor tracks the device
    truth. Applied identically to every candidate in the set, so ratios
    remain apples-to-apples."""
    iters = iters if iters is not None else SCAN_ITERS
    args_of = lambda k: args_map.get(k, args) if args_map else args
    for k, run in runs.items():
        float(run(*args_of(k)))  # compile + warm
    float(nop(*args))
    totals = {k: [] for k in runs}
    overheads = {k: [] for k in runs}
    names = list(runs)
    for rnd in range(rounds):
        for k in names[rnd % len(names):] + names[:rnd % len(names)]:
            a = args_of(k)
            t0 = time.perf_counter()
            float(runs[k](*a))
            totals[k].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(nop(*a))
            overheads[k].append(time.perf_counter() - t0)
    if estimator == "minfloor":
        return {k: max(min(totals[k]) - min(overheads[k]), 1e-9) / iters
                for k in runs}
    return {k: float(np.median([max(t - o, 1e-9) / iters
                                for t, o in zip(totals[k], overheads[k])]))
            for k in runs}


def while_ms_from_trace(trace_dir: str, iters: int) -> float:
    """Per-iter ms of the scan while-loop on the /device:TPU lane — the
    authoritative device-timeline timer (repeats to ±2 µs; CLAUDE.md):
    scan-wall A/B deltas carry 0.5-1.3 ms/iter of host dispatch noise that
    routed graphs pay more of than dense, so wall ratios under-report
    routing. Mirrors tools/perf_r50_trace.py::while_ms."""
    import glob
    import gzip

    base = os.path.join(trace_dir, "plugins", "profile")
    runs = sorted(glob.glob(os.path.join(base, "*")))
    files = glob.glob(os.path.join(runs[-1], "*.trace.json.gz"))
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    dev_pids = {
        e["pid"] for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "/device:TPU" in e.get("args", {}).get("name", "")
    }
    durs = [
        e["dur"] for e in tr["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") in dev_pids
        and e.get("name", "").startswith("while")
    ]
    assert durs, f"no while events in {trace_dir}"
    # one while event per scan call; its body runs ``iters`` times
    return max(durs) / 1e3 / iters


def measure_device_while(runs: dict, args_of, iters: int,
                         trace_root: str = "/tmp/bench_traces") -> dict:
    """{name: device-timeline sec/iter} via one traced scan call per
    candidate (already compiled+warmed by a prior measure_interleaved).
    Contention shifts absolute device times too, but the while event is
    immune to host dispatch/readback noise — the pair (wall, device) is
    the honest two-timer report (VERDICT r4 item 3)."""
    import jax

    out = {}
    for name, fn in runs.items():
        d = os.path.join(trace_root, name)
        with jax.profiler.trace(d):
            float(fn(*args_of(name)))
        out[name] = while_ms_from_trace(d, iters) / 1e3
    return out


def make_eval_batch(rng, bs, h, w):
    """Synthetic eval stream matching tools/train_bench_gate.py: half the
    samples get rgb-correlated (informative) depth, half near-zero depth."""
    rgb = rng.standard_normal((bs, h, w, 3)).astype(np.float32)
    base = rgb.mean(axis=-1, keepdims=True)
    depth = np.where(
        (np.arange(bs) % 2 == 0)[:, None, None, None],
        base + 0.3 * rng.standard_normal((bs, h, w, 1)).astype(np.float32),
        0.02 * rng.standard_normal((bs, h, w, 1)).astype(np.float32),
    )
    return rgb, depth


def _jsonable(x):
    """Recursively convert msgpack-restored values to json-serializable."""
    if isinstance(x, dict):
        return {str(k): _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, bytes):
        return x.decode()
    if isinstance(x, np.generic):
        return x.item()
    if isinstance(x, np.ndarray):
        return x.tolist()
    return x


def _merge_subtree(dst, src, path=""):
    """Recursively overwrite ``dst`` leaves with ``src`` (a state-dict
    subset); shapes must match."""
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict):
            out[k] = _merge_subtree(out[k], v, f"{path}/{k}")
        else:
            arr = np.asarray(v)
            ref = np.asarray(out[k])
            assert arr.shape == ref.shape, (
                f"recipe-asset shape mismatch at {path}/{k}: "
                f"{arr.shape} vs {ref.shape}")
            out[k] = arr.astype(ref.dtype)
    return out


def load_recipe_gate(variables, encoder="resnet34", asset_dir=None):
    """Swap in the reference-recipe-trained gate PLUS everything upstream of
    its input (stem conv1/bn1 of both encoders, the stem SE fusion, and
    their BN running stats) — produced by tools/train_recipe_gate.py via the
    real two-stage train.py workflow (reference README.md:83-89). Returns
    (variables, ratios, provenance) or (variables, None, None)."""
    import flax.serialization

    if asset_dir is None:
        asset_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_assets")
    suffix = "" if encoder == "resnet34" else f"_{encoder}"
    path = os.path.join(asset_dir, f"gate_recipe{suffix}.msgpack")
    if not os.path.exists(path):
        return variables, None, None
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    sub = payload["subtree"]
    new_vars = dict(variables)
    new_vars["params"] = _merge_subtree(variables["params"], sub["params"])
    if sub.get("batch_stats"):
        new_vars["batch_stats"] = _merge_subtree(
            variables["batch_stats"], sub["batch_stats"])
    return (new_vars, np.asarray(payload["branch_ratios"]),
            payload.get("provenance"))


def make_recipe_eval_batch(bs, h, w, seed=7, mixed_frac=0.5):
    """Preprocessed synthetic eval batch with an EXACT half depth-needed /
    half rgb-sufficient composition — the distribution the recipe gate was
    trained on (SyntheticSegDataset mixed_modality_frac). Returns
    (rgb, depth) float32 arrays."""
    from dynmm_tpu.data.nyuv2 import SyntheticSegDataset
    from dynmm_tpu.data.seg_preprocessing import SegPreprocessor

    ds = SyntheticSegDataset(
        n=1 << 30, height=h, width=w, seed=seed, split="test",
        mixed_modality_frac=mixed_frac,
    )
    pre = SegPreprocessor(ds.depth_mean, ds.depth_std, h, w, phase="test")
    want_hard = bs // 2
    idxs, n_hard, i = [], 0, 0
    while len(idxs) < bs:
        hard = ds.depth_needed(i)
        if hard and n_hard < want_hard:
            idxs.append(i)
            n_hard += 1
        elif not hard and len(idxs) - n_hard < bs - want_hard:
            idxs.append(i)
        i += 1
    rng = np.random.default_rng(0)  # test phase: rng unused by transforms
    samples = [pre(ds[j], rng) for j in idxs]
    rgb = np.stack([s["image"] for s in samples]).astype(np.float32)
    depth = np.stack([s["depth"] for s in samples]).astype(np.float32)
    return rgb, depth


def load_trained_gate(variables):
    """Swap in the committed trained gate; returns (variables, ratios|None)."""
    import flax.serialization
    import jax

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_assets", "gate_trained.msgpack")
    if not os.path.exists(path):
        return variables, None
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    gate = flax.serialization.from_state_dict(
        variables["params"]["gate_layer"], payload["gate_params"]
    )
    params = dict(variables["params"])
    params["gate_layer"] = gate
    variables = {**variables, "params": params}
    return variables, np.asarray(payload["branch_ratios"])


def bench_modality():
    """Modality-level routing throughput (the stack where DynMM's savings
    map onto TPU wall time — the seg model's skippable depth encoder costs
    <1.2 ms while its gate costs ~1.1, see docs/DESIGN.md): MOSEI 2-branch
    router at serving batch, bucket-compacted, at forced easy/hard mixtures
    f = fraction on the expensive tri-modal branch. Returns a JSON-ready
    dict (ms per batch + ratios vs the static big-branch baseline)."""
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.models.modality import IMDBDynMMNet, MoseiDynMMNetV2

    rng = np.random.default_rng(7)
    out = {}

    def measure_set(cands, args, iters=30):
        @jax.jit
        def nop(*a):
            return jnp.sum(a[0][(0,) * a[0].ndim])

        runs = {}
        for name, f in cands.items():
            @jax.jit
            def run(*a, f=f):
                def body(c, _):
                    # perturb EVERY float stream: branches that ignore one
                    # modality must still depend on the carry, or XLA
                    # hoists the whole body out of the scan
                    pert = tuple(
                        x + c if getattr(x, "dtype", None) is not None
                        and x.dtype.kind == "f" else x
                        for x in a)
                    o = f(*pert)
                    return 1e-30 * jnp.sum(o[(0,) * o.ndim]), ()
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=iters)
                return c
            runs[name] = run
            float(run(*args))  # compile
        # interleave reps so contention drift cancels in the ratios
        raw = {k: [] for k in runs}
        names = list(runs)
        for rnd in range(4):
            for k in names[rnd % len(names):] + names[:rnd % len(names)]:
                t0 = time.perf_counter(); float(runs[k](*args))
                tot = time.perf_counter() - t0
                t0 = time.perf_counter(); float(nop(*args))
                ov = time.perf_counter() - t0
                raw[k].append(max(tot - ov, 1e-9) / iters)
        return {k: float(np.median(v)) for k, v in raw.items()}

    # ---- MOSEI (bs=1024, T=50) ----
    bs, t = 1024, 50
    vis = jnp.asarray(rng.standard_normal((bs, t, 35)).astype(np.float32))
    aud = jnp.asarray(rng.standard_normal((bs, t, 74)).astype(np.float32))
    txt = jnp.asarray(rng.standard_normal((bs, t, 300)).astype(np.float32))
    lens = jnp.asarray(np.full((bs,), t, np.int32))
    model = MoseiDynMMNetV2()
    mv = model.init(jax.random.PRNGKey(0), [vis, aud, txt], [lens] * 3)

    def forced(frac):
        fk = jnp.asarray(
            (np.arange(bs) < int(round(frac * bs))).astype(np.int32))
        return lambda v0, a, tx, ln, v: model.apply(
            v, [v0, a, tx], [ln] * 3, force_k=fk,
            method=model.forward_routed_compact)[0]

    cands = {
        "baseline_big": lambda v0, a, tx, ln, v: model.apply(
            v, [v0, a, tx], [ln] * 3, infer_mode=2)[0],
        "f0": forced(0.0), "f25": forced(0.25), "f50": forced(0.5),
    }
    res = measure_set(cands, (vis, aud, txt, lens, mv))
    big = res["baseline_big"]
    out["mosei_bs1024"] = {
        "baseline_big_ms": round(big * 1e3, 3),
        "routed_ms": {k: round(res[k] * 1e3, 3) for k in ("f0", "f25", "f50")},
        "vs_big": {k: round(big / res[k], 2) for k in ("f0", "f25", "f50")},
    }
    log(f"mosei bs=1024: big {big*1e3:.2f} ms; routed f0/f25/f50 "
        + "/".join(f"{res[k]*1e3:.2f}" for k in ("f0", "f25", "f50"))
        + " ms (vs_big "
        + "/".join(f"{big/res[k]:.2f}" for k in ("f0", "f25", "f50")) + ")")

    # ---- MM-IMDB (bs=4096; 8.7× branch MAC ratio) ----
    ib = 4096
    text = jnp.asarray(rng.standard_normal((ib, 300)).astype(np.float32))
    image = jnp.asarray(rng.standard_normal((ib, 4096)).astype(np.float32))
    imodel = IMDBDynMMNet()
    iv = imodel.init(jax.random.PRNGKey(1), [text, image])

    def iforced(frac):
        fk = jnp.asarray(
            (np.arange(ib) < int(round(frac * ib))).astype(np.int32))
        return lambda t, im, v: imodel.apply(
            v, [t, im], force_k=fk,
            method=imodel.forward_routed_compact)[0]

    icands = {
        "baseline_big": lambda t, im, v: imodel.apply(
            v, [t, im], infer_mode=2)[0],
        "f0": iforced(0.0), "f25": iforced(0.25), "f50": iforced(0.5),
    }
    # iters=400: the f0 candidate is ~30-40 µs/iter — at iters=30 the whole
    # call sits under the tunnel's ±ms noise floor and the median can reach
    # 0 ms (r3 run reported an absurd 2.5e7× ratio); 400 iters puts ~14 ms
    # of signal behind the smallest candidate
    ires = measure_set(icands, (text, image, iv), iters=400)
    ibig = ires["baseline_big"]
    out["imdb_bs4096"] = {
        "baseline_big_ms": round(ibig * 1e3, 3),
        "routed_ms": {k: round(ires[k] * 1e3, 3)
                      for k in ("f0", "f25", "f50")},
        "vs_big": {k: round(ibig / ires[k], 2) for k in ("f0", "f25", "f50")},
    }
    log(f"imdb bs=4096: big {ibig*1e3:.2f} ms; routed f0/f25/f50 "
        + "/".join(f"{ires[k]*1e3:.2f}" for k in ("f0", "f25", "f50"))
        + " ms (vs_big "
        + "/".join(f"{ibig/ires[k]:.2f}" for k in ("f0", "f25", "f50")) + ")")
    return out


def bench_r50():
    """SkipGateESANet-R50 routing economics at bs=8 (the reference's R50
    config — its per-path GFLOP table is model_skip_mod_globalgate.py:223).
    Returns forced-path ms + ratios vs the dense baseline."""
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.models.esanet import ESANetConfig
    from dynmm_tpu.models.skip_gate import SkipGateESANet

    # ITERS=40 here, not the series default 10: scan-wall readings carry a
    # fixed per-call dispatch cost that routed graphs pay more of than dense
    # (~0.5-1.3 ms/iter at ITERS=10 — CLAUDE.md, tools/perf_routed_decomp.py);
    # at 10 iters it inverts the R50 routed-vs-dense sign vs the
    # authoritative device timeline (tools/perf_r50_trace.py: routed sched
    # 1.038x, strict 1.077x on the while-loop event, and the same probe's
    # ITERS=40 scan cross-check agrees at 1.036x/1.071x). The ITERS=40
    # graphs are already in .jax_cache from that probe.
    global SCAN_ITERS
    saved_iters, SCAN_ITERS = SCAN_ITERS, 40
    try:
        return _bench_r50_body()
    finally:
        # restore even on failure: main() keeps running after a bench_r50
        # exception, and a leaked 40 would re-compile every later graph at
        # an uncached scan length (ADVICE r4)
        SCAN_ITERS = saved_iters


def _bench_r50_body():
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.models.esanet import ESANetConfig
    from dynmm_tpu.models.skip_gate import SkipGateESANet

    cfg = ESANetConfig(
        height=480, width=640, num_classes=40,
        encoder_rgb="resnet50", encoder_depth="resnet50",
        encoder_block="Bottleneck",
        channels_decoder=(512, 256, 128), nr_decoder_blocks=(3, 3, 3),
        fuse_depth_in_rgb_encoder="SE-add",
        upsampling="learned-3x3-zeropad",
    )
    model = SkipGateESANet(cfg)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, BS, 480, 640)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(rgb0), jnp.asarray(depth0),
        train=False)
    # recipe-trained R50 gate (tools/train_recipe_gate.py ENCODER=resnet50):
    # with it, a real routed-vs-dense ratio joins the forced-path bounds,
    # on the eval distribution the gate was trained for
    variables, r50_ratios, _ = load_recipe_gate(variables, "resnet50")
    if r50_ratios is not None:
        rgb0, depth0 = make_recipe_eval_batch(BS, 480, 640)
        log(f"r50 gate: recipe (ratios "
            f"{np.array2string(r50_ratios, precision=3)})")
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    cands = {
        "dense_base": lambda v, r, d: model.apply(
            v, r, d, train=False, baseline=True),
        "force_k0": lambda v, r, d: model.apply(
            v, r, d, force_path=0, method=model.forward_switch_batched),
        "force_k2": lambda v, r, d: model.apply(
            v, r, d, force_path=2, method=model.forward_switch_batched),
        "force_k4": lambda v, r, d: model.apply(
            v, r, d, force_path=4, method=model.forward_switch_batched),
    }
    if r50_ratios is not None:
        from dynmm_tpu.models.skip_gate import capacity_ladders

        r50_caps = capacity_ladders(r50_ratios, BS)
        log(f"r50 routed capacity schedule: {r50_caps}")
        cands["routed"] = lambda v, r, d: model.apply(
            v, r, d, caps=r50_caps,
            method=model.forward_routed_compact)
        # MoE capacity-factor serving (strict_caps): zero cond boundaries;
        # rungs at ceil(bs*P*1.25) cover the eval mix with slack, overflow
        # degrades gracefully (drops that stage's depth contribution)
        r50_strict = capacity_ladders(r50_ratios, BS, capacity_factor=1.25)
        cands["routed_strict"] = lambda v, r, d: model.apply(
            v, r, d, caps=r50_strict, strict_caps=True,
            method=model.forward_routed_compact)
    # round-robin interleaved: sequential best-of reps are biased by the
    # ~1.5x contention drift (ADVICE r2)
    res = measure_interleaved(
        {k: make_scan_bench(f) for k, f in cands.items()},
        nop, variables, rgb, depth, rounds=4,
    )
    for name, t in res.items():
        log(f"r50 {name}: {t*1e3:.2f} ms/batch ({BS/t:.1f} fps)")
    base = res["dense_base"]
    skip_keys = ("dense_base", "routed", "routed_strict")
    out = {
        "dense_base_ms": round(base * 1e3, 2),
        "forced_ms": {k: round(res[k] * 1e3, 2)
                      for k in res if k not in skip_keys},
        "vs_base": {k: round(base / res[k], 3)
                    for k in res if k not in skip_keys},
    }
    if "routed" in res:
        out["routed_ms"] = round(res["routed"] * 1e3, 2)
        out["routed_vs_dense"] = round(base / res["routed"], 4)
        out["gate"] = "recipe"
        out["branch_ratios"] = [round(float(x), 4) for x in r50_ratios]
        out["capacity_schedule"] = [list(l) for l in r50_caps]
    if "routed_strict" in res:
        out["routed_strict_ms"] = round(res["routed_strict"] * 1e3, 2)
        out["routed_strict_vs_dense"] = round(
            base / res["routed_strict"], 4)
    out["scan_iters"] = SCAN_ITERS
    return out


def main():
    global SCAN_ITERS  # bs=1 block overrides and restores it
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    h, w = 480, 640
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, BS, h, w)
    rgb = jnp.asarray(rgb0)
    depth = jnp.asarray(depth0)

    log(f"devices: {jax.devices()}")
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    # Prefer the reference-recipe gate asset (tools/train_recipe_gate.py:
    # two-stage hard-loss init → temp-annealed soft, through the real
    # train.py CLI); its eval stream is the preprocessed synthetic mix it
    # was trained on. Fall back to the round-1 self-distilled gate.
    variables, trained_ratios, recipe_prov = load_recipe_gate(variables)
    if trained_ratios is not None:
        gate_kind = "recipe"
        rgb0, depth0 = make_recipe_eval_batch(BS, h, w)
        rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    else:
        variables, trained_ratios = load_trained_gate(variables)
        gate_kind = "trained" if trained_ratios is not None else "untrained"
    log(f"gate: {gate_kind}"
        + (f" (ratios {np.array2string(trained_ratios, precision=3)})"
           if trained_ratios is not None else ""))

    @jax.jit
    def nop(variables, rgb, depth):
        return jnp.sum(rgb[0, 0, 0])

    # The serving series, ONE interleaved set (contention drift cancels in
    # every ratio). Mixed eval batch: half informative-depth, half
    # near-zero, so the trained gate routes input-dependently and routed
    # candidates exercise mixed buckets. Ladder (0, bs/2, bs): best of the
    # measured ladders in both dtypes with the scatter-based compact path
    # (tools/perf_routed_decomp.py — the 0 rung skips stage-4 depth
    # entirely on the mixed stream).
    model_bf16 = _flagship(h, w, dtype=jnp.bfloat16)
    # Space-to-depth pre-packed inputs (resnet.space_to_depth_host): the
    # serving fast path — the host packs (N,H,W,C)→(N,H/2,W/2,4C) with the
    # resize/normalize preprocessing, and the stem runs the 5.5×-faster
    # packed 4×4 conv with no on-device shuffle (tools/perf_packed_stem.py:
    # 1.15× whole-net at bs=8 bf16, 1.3× at bs=1).
    from dynmm_tpu.models.resnet import space_to_depth_host
    rgb_p = jnp.asarray(space_to_depth_host(rgb0))
    depth_p = jnp.asarray(space_to_depth_host(depth0))

    def dense_fn(m):
        return lambda v, r, d: m.apply(v, r, d, train=False, baseline=True)

    # Per-stage capacity schedule from the trained gate's held-out ratios
    # (skip_gate.capacity_ladders): an always-on stage compiles with NO
    # cond boundary, a dead stage with one — at ~0.15-0.25 ms per executed
    # cond (tools/perf_dispatch.py, perf_r50_trace.py) the schedule
    # recovers most of the ladder tax vs the shared (0, bs/2, bs) ladder.
    # Exact for ANY batch regardless of the ratios (bs rung fallback).
    if trained_ratios is not None:
        from dynmm_tpu.models.skip_gate import capacity_ladders
        routed_caps = capacity_ladders(trained_ratios, BS)
        log(f"routed capacity schedule: {routed_caps}")
    else:
        routed_caps = (0, BS // 2, BS)

    def routed_fn(m):
        return lambda v, r, d: m.apply(
            v, r, d, caps=routed_caps, method=m.forward_routed_compact)

    def routed_q4_fn(m):
        return lambda v, r, d: m.apply(
            v, r, d, caps=routed_caps, low_res=True,
            method=m.forward_routed_compact)

    def dense_q4_fn(m):
        return lambda v, r, d: m.apply(
            v, r, d, train=False, baseline=True, low_res=True)

    def classmap_fn(fwd):
        from dynmm_tpu.nn.layers import first_argmax

        return lambda v, r, d: first_argmax(fwd(v, r, d), axis=-1)

    runs = {
        "dense_fp32": make_scan_bench(dense_fn(model)),
        "dense_bf16": make_scan_bench(dense_fn(model_bf16)),
        "routed_fp32": make_scan_bench(routed_fn(model)),
        "routed_bf16": make_scan_bench(routed_fn(model_bf16)),
        "batchmax_fp32": make_scan_bench(
            lambda v, r, d: model.apply(
                v, r, d, method=model.forward_switch_batched)),
        "dense_fp32_packed": make_scan_bench(dense_fn(model)),
        "dense_bf16_packed": make_scan_bench(dense_fn(model_bf16)),
        "routed_fp32_packed": make_scan_bench(routed_fn(model)),
        "routed_bf16_packed": make_scan_bench(routed_fn(model_bf16)),
        # class-MAP serving chains (the deliverable is an argmax map, not
        # logits): full-res pays the two 40-ch x2 learned upsamples + a
        # full-res argmax; q4 argmaxes the native H/4 logits (low_res=True,
        # predict.py --output_res quarter) and nearest-upsamples the uint8
        # map on the host (tools/perf_lowres.py)
        "dense_fp32_classmap": make_scan_bench(classmap_fn(dense_fn(model))),
        "routed_bf16_packed_classmap": make_scan_bench(
            classmap_fn(routed_fn(model_bf16))),
        "routed_bf16_packed_q4_classmap": make_scan_bench(
            classmap_fn(routed_q4_fn(model_bf16))),
        "dense_bf16_packed_q4_classmap": make_scan_bench(
            classmap_fn(dense_q4_fn(model_bf16))),
    }
    packed_args = (variables, rgb_p, depth_p)
    args_map = {k: packed_args for k in runs if "_packed" in k}

    # ranked candidates for the best_classmap headline (min over present)
    _CLASSMAP_CANDS = (
        "routed_bf16_packed_q4_classmap",
        "dense_bf16_packed_q4_classmap",
        "int8_routed_packed_q4_classmap",
        "int8_dense_packed_q4_classmap",
    )

    # int8 PTQ serving chains (nn/quant.py; accuracy scored by
    # `eval.py --quant int8`): abs-max calibration on 2 eval-stream batches,
    # then the quantized twins join the same interleave set. Guarded — the
    # bench must survive any int8 lowering failure. BENCH_INT8=0 skips.
    model_int8, v_int8 = None, None
    if os.environ.get("BENCH_INT8", "1") not in ("", "0", "false"):
        try:
            from dynmm_tpu.utils.quantize import (calibrate, pack_weights,
                                                  quant_sanity)

            model_calib = _flagship(h, w, quant="calib")
            model_int8 = _flagship(h, w, dtype=jnp.bfloat16, quant="int8")

            def _calib_batches():
                for i in range(2):
                    if gate_kind == "recipe":
                        rb, db = make_recipe_eval_batch(BS, h, w,
                                                        seed=4321 + i)
                    else:
                        rb, db = make_eval_batch(
                            np.random.default_rng(4321 + i), BS, h, w)
                    yield jnp.asarray(rb), jnp.asarray(db)

            qcoll = calibrate(model_calib, variables, _calib_batches(),
                              train=False, hard=True)
            # load-time weight packing: kernels become int8 leaves, no
            # per-call re-quantization (bit-exact vs in-graph)
            v_int8 = pack_weights({**variables, "quant": qcoll})
            log(f"int8: calibrated {quant_sanity(qcoll)} scales (packed)")
            int8_args = (v_int8, rgb_p, depth_p)
            for key, fn in (
                ("int8_dense_packed_q4_classmap", dense_q4_fn(model_int8)),
                ("int8_routed_packed_q4_classmap", routed_q4_fn(model_int8)),
            ):
                runs[key] = make_scan_bench(classmap_fn(fn))
                args_map[key] = int8_args
        except Exception as e:
            log(f"int8 serving candidates failed: {e}")
            model_int8, v_int8 = None, None

    meds = measure_interleaved(
        runs, nop, variables, rgb, depth, args_map=args_map,
    )
    for k, t in meds.items():
        log(f"bs={BS} {k}: {t*1e3:.2f} ms/batch ({BS/t:.1f} fps)")

    # Device-timeline truth for the contested ratios (VERDICT r4 item 3):
    # one traced scan call per candidate, while-loop event = authoritative
    # per-iter time (CLAUDE.md). Wall ratios stay in the series unchanged —
    # the pair is the honest two-timer report. Guarded: tracing must never
    # kill the bench. BENCH_TRACE=0 skips.
    dev_series = {}
    if os.environ.get("BENCH_TRACE", "1") not in ("", "0", "false"):
        try:
            trace_keys = ["dense_bf16_packed", "routed_bf16_packed",
                          "dense_fp32_classmap"]
            trace_keys += [k for k in ("int8_dense_packed_q4_classmap",
                                       "dense_bf16_packed_q4_classmap")
                           if k in runs]
            devs = measure_device_while(
                {k: runs[k] for k in trace_keys},
                lambda k: args_map.get(k, (variables, rgb, depth)),
                SCAN_ITERS)
            for k, t in devs.items():
                log(f"device {k}: {t*1e3:.3f} ms/iter")
            dev_series["routed_vs_dense_bf16_device"] = round(
                devs["dense_bf16_packed"] / devs["routed_bf16_packed"], 4)
            dev_series["best_classmap_vs_dense_fp32_device"] = round(
                devs["dense_fp32_classmap"]
                / min(devs[k] for k in devs if k.endswith("_q4_classmap")),
                4)
            dev_series.update({
                f"{k}_device_ms": round(t * 1e3, 3)
                for k, t in devs.items()})
        except Exception as e:
            log(f"device-timeline traces failed: {e}")
            dev_series = {}
    tb, tb16 = meds["dense_fp32"], meds["dense_bf16"]
    td, td16 = meds["routed_fp32"], meds["routed_bf16"]
    tm = meds["batchmax_fp32"]
    tdp16 = meds["routed_bf16_packed"]

    # Per-path forced throughput (real skipping, whole batch on path k),
    # interleaved across the 5 paths.
    path_meds = measure_interleaved(
        {
            f"k{k}": make_scan_bench(
                functools.partial(
                    lambda v, r, d, k: model.apply(
                        v, r, d, force_path=k,
                        method=model.forward_switch_batched),
                    k=k,
                )
            )
            for k in range(5)
        },
        nop, variables, rgb, depth, rounds=3,
    )
    per_path = {}
    for k in range(5):
        tk = path_meds[f"k{k}"]
        per_path[f"k{k}"] = round(BS / tk, 1)
        log(f"  forced path k={k}: {tk*1e3:.2f} ms/batch ({BS/tk:.1f} fps)")

    # bs=1 serving latency (the reference's eval regime): packed bf16
    # switch is the shipped single-image path. 50 scan iters — bs=1 bodies
    # are ~2-3 ms, so the default 10 would leave the readback noise floor
    # too close.
    saved_iters, SCAN_ITERS = SCAN_ITERS, 50
    try:
        bs1_runs = {
            "bs1_dense_fp32": make_scan_bench(dense_fn(model)),
            "bs1_dense_bf16_packed": make_scan_bench(dense_fn(model_bf16)),
            "bs1_switch_bf16_packed": make_scan_bench(
                lambda v, r, d: model_bf16.apply(
                    v, r, d, method=model_bf16.forward_switch)),
            # q4 serving chain at bs=1: the in-graph switch BEATS dense here
            # (tools/perf_bs1_paths.py: 1.40 vs 1.57 ms at the trained mix)
            # — the skipped depth stages finally outweigh the cond tax once
            # the tail is quarter-res
            "bs1_dense_bf16_packed_q4": make_scan_bench(dense_q4_fn(model_bf16)),
            "bs1_switch_bf16_packed_q4": make_scan_bench(
                lambda v, r, d: model_bf16.apply(
                    v, r, d, low_res=True, method=model_bf16.forward_switch)),
        }
        bs1_raw = (variables, rgb[:1], depth[:1])
        bs1_packed = (variables, rgb_p[:1], depth_p[:1])
        bs1_args_map = {k: bs1_packed for k in bs1_runs if "packed" in k}
        # int8 twins of the q4 chains (same calibration as the bs=8 series;
        # abs-max scales are batch-size independent)
        if v_int8 is not None:
            bs1_runs["bs1_int8_dense_packed_q4"] = make_scan_bench(
                dense_q4_fn(model_int8))
            bs1_runs["bs1_int8_switch_packed_q4"] = make_scan_bench(
                lambda v, r, d: model_int8.apply(
                    v, r, d, low_res=True, method=model_int8.forward_switch))
            bs1_int8 = (v_int8, rgb_p[:1], depth_p[:1])
            bs1_args_map["bs1_int8_dense_packed_q4"] = bs1_int8
            bs1_args_map["bs1_int8_switch_packed_q4"] = bs1_int8
        bs1_meds = measure_interleaved(
            bs1_runs, nop, *bs1_raw, rounds=3, iters=SCAN_ITERS,
            args_map=bs1_args_map,
        )
        for k, t in bs1_meds.items():
            log(f"{k}: {t*1e3:.2f} ms ({1/t:.1f} fps)")
        bs1_series = {f"{k}_ms": round(v * 1e3, 3)
                      for k, v in bs1_meds.items()}
    except Exception as e:  # bs=1 series must never kill the bench
        log(f"bs=1 series failed: {e}")
        bs1_series = {}
    finally:
        SCAN_ITERS = saved_iters

    # Headline window at 40 scan iters (VERDICT r4 item 1): at the default
    # 10 iters the per-CALL costs (host dispatch, out-of-loop weight
    # prep) land 4x harder on each iter, and the int8 chain carries more
    # of them than the dense fp32 reference — the r4 wall ratio (2.83)
    # sat well under the device-timeline truth (3.09). 40 iters amortizes
    # both sides toward their device times; candidates stay interleaved.
    hmeds = {}
    saved_iters, SCAN_ITERS = SCAN_ITERS, 40
    try:
        hruns = {
            "dense_fp32_classmap": make_scan_bench(
                classmap_fn(dense_fn(model))),
            "dense_bf16_packed_q4_classmap": make_scan_bench(
                classmap_fn(dense_q4_fn(model_bf16))),
            "routed_bf16_packed_q4_classmap": make_scan_bench(
                classmap_fn(routed_q4_fn(model_bf16))),
        }
        hargs = {k: packed_args for k in hruns if "_packed" in k}
        if v_int8 is not None:
            hruns["int8_dense_packed_q4_classmap"] = make_scan_bench(
                classmap_fn(dense_q4_fn(model_int8)))
            hargs["int8_dense_packed_q4_classmap"] = int8_args
        # minfloor + 7 rounds: run-to-run the device timeline is
        # bit-identical (6.570/20.251 ms) while the paired-median wall
        # swung 3.05→2.91 across whole-bench runs on the 1-core host —
        # the min over interleaved reps is the additive-noise floor and
        # tracks the device ratio (3.08).
        hmeds = measure_interleaved(
            hruns, nop, variables, rgb, depth, rounds=7, iters=SCAN_ITERS,
            args_map=hargs, estimator="minfloor")
        for k, t in hmeds.items():
            log(f"headline(iters=40) {k}: {t*1e3:.2f} ms/batch "
                f"({BS/t:.1f} fps)")
    except Exception as e:  # headline window must never kill the bench
        log(f"headline 40-iter window failed: {e}")
        hmeds = {}
    finally:
        SCAN_ITERS = saved_iters

    # bs=16 serving point (VERDICT r4 item 1): per-batch fixed costs
    # (dispatch, gate, stem boundaries) amortize over more rows; the best
    # class-map ratio may prefer it. Pairs are same-bs and interleaved in
    # their own window, so the ratio is contention-robust. BENCH_BS16=0
    # skips.
    bs16_series = {}
    BS16 = 16
    if os.environ.get("BENCH_BS16", "1") not in ("", "0", "false"):
        # 20 iters: bs=16 bodies are ~2x the bs=8 ones, so 20 matches the
        # headline window's per-call amortization
        saved_iters, SCAN_ITERS = SCAN_ITERS, 20
        try:
            if gate_kind == "recipe":
                rgb16_0, depth16_0 = make_recipe_eval_batch(
                    BS16, h, w, seed=77)
            else:
                rgb16_0, depth16_0 = make_eval_batch(
                    np.random.default_rng(77), BS16, h, w)
            rgb16 = jnp.asarray(rgb16_0)
            depth16 = jnp.asarray(depth16_0)
            rgb16_p = jnp.asarray(space_to_depth_host(rgb16_0))
            depth16_p = jnp.asarray(space_to_depth_host(depth16_0))
            runs16 = {
                "bs16_dense_fp32_classmap": make_scan_bench(
                    classmap_fn(dense_fn(model))),
                "bs16_dense_bf16_packed_q4_classmap": make_scan_bench(
                    classmap_fn(dense_q4_fn(model_bf16))),
            }
            args16 = {
                "bs16_dense_bf16_packed_q4_classmap":
                    (variables, rgb16_p, depth16_p),
            }
            if v_int8 is not None:
                runs16["bs16_int8_dense_packed_q4_classmap"] = \
                    make_scan_bench(classmap_fn(dense_q4_fn(model_int8)))
                args16["bs16_int8_dense_packed_q4_classmap"] = \
                    (v_int8, rgb16_p, depth16_p)
            meds16 = measure_interleaved(
                runs16, nop, variables, rgb16, depth16, rounds=5,
                iters=SCAN_ITERS, args_map=args16, estimator="minfloor")
            for k, t in meds16.items():
                log(f"bs={BS16} {k}: {t*1e3:.2f} ms/batch "
                    f"({BS16/t:.1f} fps)")
            t16_ref = meds16["bs16_dense_fp32_classmap"]
            bs16_series = {f"{k}_fps": round(BS16 / t, 1)
                           for k, t in meds16.items()}
            win16 = min((k for k in meds16
                         if k != "bs16_dense_fp32_classmap"),
                        key=meds16.get)
            bs16_series["bs16_best_classmap_vs_dense_fp32"] = round(
                t16_ref / meds16[win16], 4)
            bs16_series["bs16_best_classmap_candidate"] = (
                win16.replace("_classmap", ""))
        except Exception as e:  # bs=16 series must never kill the bench
            log(f"bs=16 series failed: {e}")
            bs16_series = {}
        finally:
            SCAN_ITERS = saved_iters

    # live gate path histogram on the eval stream (hard selections)
    @jax.jit
    def paths_of(v, r, d):
        _, wgt = model.apply(v, r, d, train=False, hard=True,
                             return_weight=True)
        return jnp.argmax(wgt, axis=-1)

    counts = np.zeros(5, np.int64)
    eval_rng = np.random.default_rng(1234)
    for i in range(N_BATCHES):
        if gate_kind == "recipe":
            rb, db = make_recipe_eval_batch(BS, h, w, seed=1234 + i)
        else:
            rb, db = make_eval_batch(eval_rng, BS, h, w)
        p = np.asarray(paths_of(variables, jnp.asarray(rb), jnp.asarray(db)))
        counts += np.bincount(p, minlength=5)
    ratios = (counts / counts.sum()).round(4)
    log(f"live branch ratios on eval stream: {ratios}")

    # Contention anchor + train-step throughput (stable-series members).
    try:
        anchor = measure_matmul_anchor()
    except Exception as e:
        log(f"matmul anchor failed: {e}")
        anchor = None
    train_sps, train_sps16 = None, None
    if os.environ.get("BENCH_TRAIN", "1") not in ("", "0", "false"):
        try:
            train_sps = measure_train_step()
        except Exception as e:
            log(f"train-step bench failed: {e}")
        try:
            train_sps16 = measure_train_step("bfloat16")
        except Exception as e:
            log(f"train-step bf16 bench failed: {e}")

    # Modality-level routing (where DynMM's savings land on TPU wall time).
    try:
        modality = bench_modality()
    except Exception as e:  # must never kill the headline bench
        log(f"modality bench failed: {e}")
        modality = {"error": str(e)[:200]}

    # R50 flagship variant: the reference's own ResNet50 config
    # (model_skip_mod_globalgate.py:223), where the MXU-dense depth encoder
    # makes fusion-level routing WIN on-chip. Default ON since r3 (the
    # ~16 min cold compile persists in .jax_cache); BENCH_R50=0 skips.
    r50 = None
    if os.environ.get("BENCH_R50", "1") not in ("", "0", "false"):
        try:
            r50 = bench_r50()
        except Exception as e:
            log(f"r50 bench failed: {e}")
            r50 = {"error": str(e)[:200]}

    try:
        if os.environ.get("BENCH_FULL", "0") in ("", "0", "false"):
            raise _SkipDiagnostics
        fdd = make_scan_bench(
            lambda v, r, d: model.apply(v, r, d, train=False, hard=True)
        )
        tdd = measure(fdd, nop, variables, rgb, depth, reps=1)
        log(f"bs={BS} dense hard: {tdd*1e3:.2f} ms/batch ({BS/tdd:.1f} fps)")
        rgb1, depth1 = rgb[:1], depth[:1]
        t_dyn = measure(
            make_scan_bench(
                lambda v, r, d: model.apply(v, r, d, method=model.forward_switch)
            ),
            nop, variables, rgb1, depth1, reps=1,
        )
        log(f"bs=1 switch routed: {t_dyn*1e3:.2f} ms ({1/t_dyn:.1f} fps)")
        t_dynp = measure(
            make_scan_bench(
                lambda v, r, d: model_bf16.apply(
                    v, r, d, method=model_bf16.forward_switch)
            ),
            nop, variables, rgb_p[:1], depth_p[:1], reps=1,
        )
        log(f"bs=1 switch routed bf16 packed: {t_dynp*1e3:.2f} ms "
            f"({1/t_dynp:.1f} fps)")
    except _SkipDiagnostics:
        log("bs=1 diagnostics skipped (set BENCH_FULL=1 to enable)")
    except Exception as e:  # diagnostics must never kill the bench
        log(f"diagnostics failed: {e}")

    # headline ratio from the 40-iter window when it ran (wall ratio there
    # tracks the device truth); the iters=10 series keys keep the
    # cross-round trend unchanged
    hsrc = hmeds if hmeds else meds
    bs8_ratio = (hsrc["dense_fp32_classmap"]
                 / min(hsrc[k] for k in _CLASSMAP_CANDS if k in hsrc))
    bs16_ratio = float(
        bs16_series.get("bs16_best_classmap_vs_dense_fp32", 0.0))
    best_cand = min((k for k in _CLASSMAP_CANDS if k in hsrc),
                    key=lambda k: hsrc[k]).replace("_classmap", "")
    if bs16_ratio > bs8_ratio:
        best_cand = "bs16_" + str(
            bs16_series["bs16_best_classmap_candidate"]).replace(
                "bs16_", "")

    result = {
                # headline: the shipped serving configuration (bf16 routed
                # compact, host-packed s2d stem inputs, trained gate, mixed
                # batch) vs the reference's compute (static dense, fp32,
                # raw inputs)
                "metric": "nyuv2_skipgate_r34nbt1d_480x640_bs8_serving_fps",
                "value": round(BS / tdp16, 3),
                "unit": "frames/sec",
                "vs_baseline": round(tb / tdp16, 4),
                # stable per-round series (same keys every round from r3;
                # *_packed keys added in r3 when host-packed stem inputs
                # became the shipped serving path)
                "series": {
                    "dense_fp32_fps": round(BS / tb, 1),
                    "dense_bf16_fps": round(BS / tb16, 1),
                    "routed_fp32_fps": round(BS / td, 1),
                    "routed_bf16_fps": round(BS / td16, 1),
                    "batchmax_fp32_fps": round(BS / tm, 1),
                    "dense_fp32_packed_fps": round(
                        BS / meds["dense_fp32_packed"], 1),
                    "dense_bf16_packed_fps": round(
                        BS / meds["dense_bf16_packed"], 1),
                    "routed_fp32_packed_fps": round(
                        BS / meds["routed_fp32_packed"], 1),
                    "routed_bf16_packed_fps": round(BS / tdp16, 1),
                    # class-MAP chains (forward + argmax, the actual serving
                    # deliverable; q4 = quarter-res logits + host nearest
                    # upsample of the uint8 map — tools/perf_lowres.py)
                    "dense_fp32_classmap_fps": round(
                        BS / meds["dense_fp32_classmap"], 1),
                    "routed_bf16_packed_classmap_fps": round(
                        BS / meds["routed_bf16_packed_classmap"], 1),
                    "routed_bf16_packed_q4_classmap_fps": round(
                        BS / meds["routed_bf16_packed_q4_classmap"], 1),
                    "dense_bf16_packed_q4_classmap_fps": round(
                        BS / meds["dense_bf16_packed_q4_classmap"], 1),
                    "classmap_q4_vs_dense_fp32": round(
                        meds["dense_fp32_classmap"]
                        / meds["routed_bf16_packed_q4_classmap"], 4),
                    # int8 PTQ chains (present when the quantized twins
                    # compiled; accuracy knob: eval.py --quant int8)
                    **{f"{k}_fps": round(BS / meds[k], 1)
                       for k in ("int8_dense_packed_q4_classmap",
                                 "int8_routed_packed_q4_classmap")
                       if k in meds},
                    # best end-to-end class-map chain vs the reference-dtype
                    # dense full-res chain (dense bf16 q4 wins on the R34
                    # flagship — routed_vs_dense physics, docs/DESIGN.md).
                    # Best over serving batch sizes {8, 16}; each ratio is
                    # same-bs and interleaved within its own window (the
                    # serving batch is a deployment knob; per-chip
                    # throughput is what BASELINE.md scores)
                    "best_classmap_vs_dense_fp32": round(
                        max(bs8_ratio, bs16_ratio), 4),
                    "best_classmap_vs_dense_fp32_bs8": round(bs8_ratio, 4),
                    **bs16_series,
                    # which candidate (and batch) won the max() above — the
                    # per-candidate *_classmap_fps keys are the cross-round
                    # trend series; the max is a convenience headline only
                    "best_classmap_candidate": best_cand,
                    **bs1_series,
                    # the honest same-dtype footnote: fusion-level routing
                    # vs dense at fp32 on the R34 flagship (<1: the
                    # skippable depth encoder costs less wall time than the
                    # gate on this arch — docs/DESIGN.md has the physics;
                    # the WINS are r50_routing and modality_routing below)
                    "routed_vs_dense_fp32": round(tb / td, 4),
                    "routed_vs_dense_bf16": round(tb16 / td16, 4),
                    # device-timeline twins (trace while-loop, ±2 µs): wall
                    # ratios under-report routing by the routed graphs'
                    # extra host dispatch — both timers reported honestly
                    **dev_series,
                    "per_path_fps": per_path,
                    **({"matmul_anchor_tflops": anchor} if anchor else {}),
                    **({"train_step_samples_per_s": train_sps}
                       if train_sps else {}),
                    **({"train_step_bf16_samples_per_s": train_sps16}
                       if train_sps16 else {}),
                },
                "branch_ratios": ratios.tolist(),
                "gate": gate_kind,
                **({"gate_provenance": _jsonable(recipe_prov)}
                   if recipe_prov else {}),
                "modality_routing": modality,
                **({"r50_routing": r50} if r50 is not None else {}),
            }
    # Full record first, compact headline LAST: the round artifact keeps
    # only the final ~2000 chars of stdout, and r4's single giant line lost
    # its own headline + the first 8 series keys to the cap (VERDICT r4
    # item 2). The last line is a self-contained parseable JSON object with
    # metric/value/unit/vs_baseline and every stable series key, trimmed
    # (least-important first) if it would ever outgrow the tail window.
    print(json.dumps(result))
    compact = {k: result[k] for k in
               ("metric", "value", "unit", "vs_baseline")}
    compact["series"] = dict(result["series"])
    compact["branch_ratios"] = result["branch_ratios"]
    compact["gate"] = result["gate"]
    # least-important last (popped first): per-candidate device-ms detail
    # goes before the headline device ratios ever would
    droppable = ["branch_ratios", "per_path_fps", "matmul_anchor_tflops",
                 "dense_bf16_packed_device_ms", "routed_bf16_packed_device_ms",
                 "dense_fp32_classmap_device_ms",
                 "int8_dense_packed_q4_classmap_device_ms",
                 "dense_bf16_packed_q4_classmap_device_ms"]
    while (len(json.dumps(compact, separators=(",", ":"))) > 1800
           and droppable):
        k = droppable.pop()
        compact.pop(k, None)
        compact["series"].pop(k, None)
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
