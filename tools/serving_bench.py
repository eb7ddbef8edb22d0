"""Serving-throughput bench: per-request decode vs dynamic request batching.

Simulates concurrent clients (Poisson arrivals at ``--rate`` req/s, one
system image each) against two service disciplines:

* ``seq`` — the reference's discipline: one model call per request, in
  arrival order (reference: acai_omr/ui/routes.py serves each upload with
  its own ``inference`` call).
* ``dyn`` — ``serving.scheduler.DynamicBatcher`` in front of
  ``inference.batch_inference`` (max_batch, max_wait_ms policy).

Reports offered load, achieved throughput, mean batch size, and request
latency percentiles (queue wait + service).  Decode lengths are capped at a
typical LMX length so the run finishes in minutes; both modes share the
same compiled programs (warmed before timing).

Usage: python tools/serving_bench.py [--mode seq|dyn|both] [--rate 16]
       [--n 96] [--max-batch 32] [--wait-ms 25] [--len 256]
"""

import argparse
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["seq", "dyn", "both"], default="both")
    ap.add_argument("--rate", type=float, default=16.0, help="req/s offered")
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--wait-ms", type=float, default=25.0)
    ap.add_argument("--len", type=int, default=256, dest="max_len")
    args = ap.parse_args()

    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.inference.batch_inference import batch_inference
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.serving.scheduler import DynamicBatcher, bucketed_runner
    from acai_omr_tpu.train.omr_teacher_force_train import set_up_vitomr

    tok = LmxTokenizer(str(Path(__file__).parent.parent / "lmx_vocab.txt"))
    cfg = set_up_vitomr(tok)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    rng = np.random.default_rng(0)
    img = rng.random((1, 256, 1024), dtype=np.float32)  # flagship system size

    def run_batch(items):
        res = batch_inference(params, cfg, items, tok,
                              max_inference_len=args.max_len,
                              decode_batch=args.max_batch,
                              compute_dtype=jnp.bfloat16)
        return res.lmx

    # warm every power-of-2 batch bucket the batcher can form, plus B=1 for
    # the sequential mode (persistent compile cache keeps these across runs)
    print("warming compiled programs ...", flush=True)
    b = 1
    while b <= args.max_batch:
        t0 = time.perf_counter()
        run_batch([img] * b)
        print(f"  warmed B={b} in {time.perf_counter() - t0:.1f}s",
              flush=True)
        b *= 2

    def drive(service_submit, service_drain):
        """Poisson arrivals; returns (wall, latencies)."""
        lat = [None] * args.n
        handles = [None] * args.n
        t0 = time.perf_counter()
        gaps = rng.exponential(1.0 / args.rate, args.n)
        for i in range(args.n):
            time.sleep(float(gaps[i]))
            handles[i] = service_submit(i)
        service_drain(handles, lat)
        wall = time.perf_counter() - t0
        return wall, lat

    results = {}

    if args.mode in ("seq", "both"):
        # one model call per request, served in arrival order by one worker
        q, done = [], threading.Event()
        lat_map = {}

        def seq_worker():
            idx = 0
            while not (done.is_set() and idx >= len(q)):
                if idx < len(q):
                    i, t_sub = q[idx]
                    run_batch([img])
                    lat_map[i] = time.perf_counter() - t_sub
                    idx += 1
                else:
                    time.sleep(0.001)

        w = threading.Thread(target=seq_worker, daemon=True)
        w.start()
        wall, _ = drive(lambda i: q.append((i, time.perf_counter())),
                        lambda hs, lat: (done.set(), w.join()))
        lats = [lat_map[i] for i in range(args.n)]
        results["seq"] = (wall, lats, args.n / wall, 1.0)
        print(f"seq: {args.n} reqs in {wall:.1f}s -> "
              f"{args.n / wall:.1f} req/s  p50 {np.percentile(lats, 50):.2f}s"
              f"  p99 {np.percentile(lats, 99):.2f}s", flush=True)

    if args.mode in ("dyn", "both"):
        b = DynamicBatcher(bucketed_runner(run_batch),
                           max_batch=args.max_batch,
                           max_wait_ms=args.wait_ms)
        try:
            wall, _ = drive(
                lambda i: b.submit(img),
                lambda hs, lat: [b.result(h, timeout=600.0) for h in hs])
            s = b.stats.summary()
            lats = b.stats.service_time
            results["dyn"] = (wall, lats, args.n / wall, s["mean_batch"])
            print(f"dyn: {args.n} reqs in {wall:.1f}s -> "
                  f"{args.n / wall:.1f} req/s  p50 "
                  f"{np.percentile(lats, 50):.2f}s  "
                  f"p99 {np.percentile(lats, 99):.2f}s  "
                  f"mean batch {s['mean_batch']:.1f}", flush=True)
        finally:
            b.close()

    if len(results) == 2:
        sw, _, st, _ = results["seq"]
        dw, _, dt, mb = results["dyn"]
        print(f"dynamic batching: {dt / st:.1f}x the sequential "
              f"throughput at {args.rate} req/s offered "
              f"(mean batch {mb:.1f})", flush=True)


if __name__ == "__main__":
    main()
