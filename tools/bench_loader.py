"""Host data-plane throughput: clips/sec out of the Loader (LMDB read ->
msgpack -> JPEG decode -> crop/resize -> batch assembly), native C++ plane
vs pure-Python fallback.

The reference's throughput ceiling was this path (PIL decode in DataLoader
workers, SURVEY.md §7 hard part 4); the device step consumes ~753 clips/s
(bench.py), so the host plane must sustain more than that per chip.

Usage:
  python tools/bench_loader.py --data_root <root> [--db <lmdb>] \
      [--seq_len 32] [--img_dim 128] [--batch_size 32] [--workers 16]
With no --data_root, builds a synthetic UCF dataset in a temp dir.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default="")
    ap.add_argument("--db", default="")
    ap.add_argument("--seq_len", default=32, type=int)
    ap.add_argument("--img_dim", default=128, type=int)
    ap.add_argument("--batch_size", default=32, type=int)
    ap.add_argument("--workers", default=16, type=int)
    ap.add_argument("--steps", default=20, type=int)
    ap.add_argument("--frame_size", default="136,180",
                    help="synthetic decode size HxW")
    args = ap.parse_args()

    from coclr_tpu.data import native
    from coclr_tpu.data.datasets import UCF101LMDB_2CLIP
    from coclr_tpu.data.loader import Loader

    if args.data_root:
        root, db = None, args.db or None
        kw = dict(data_root=args.data_root)
    else:
        from coclr_tpu.data.synthetic import make_synthetic_ucf

        h, w = (int(v) for v in args.frame_size.split(","))
        tmp = tempfile.mkdtemp(prefix="benchloader_")
        out = make_synthetic_ucf(tmp, n_classes=4, n_groups=8, n_clips=2,
                                 n_frames=args.seq_len + 8, size=(h, w))
        kw = dict(root=out["root"], db_path=out["db_path"])

    results = {}
    for mode in ("native", "python"):
        # the native lib handle is cached; reset it around the env toggle
        native._LIB, native._TRIED = None, False
        if mode == "python":
            os.environ["COCLR_NO_NATIVE"] = "1"
        else:
            os.environ.pop("COCLR_NO_NATIVE", None)
            if not native.available():
                results[mode] = None
                results[f"{mode}-process"] = None
                continue
        ds = UCF101LMDB_2CLIP(mode="train", num_frames=args.seq_len, ds=1,
                              return_label=True, img_dim=args.img_dim, **kw)
        for worker_mode in ("thread", "process"):
            loader = Loader(ds, batch_size=args.batch_size,
                            num_workers=args.workers, seed=0,
                            worker_mode=worker_mode)
            loader.set_epoch(0)
            next(iter(loader))  # warm the worker pool
            t0 = time.perf_counter()
            n, done, epoch = 0, 0, 0
            while done < args.steps:
                epoch += 1
                loader.set_epoch(epoch)
                for batch in loader:
                    n += batch["seq"].shape[0] * 2  # 2 clips per sample
                    done += 1
                    if done >= args.steps:
                        break
            dt = time.perf_counter() - t0
            key = mode if worker_mode == "thread" else f"{mode}-process"
            results[key] = round(n / dt, 1)
            loader.close()

    os.environ.pop("COCLR_NO_NATIVE", None)
    print(json.dumps({
        "metric": f"host loader clips/sec (seq {args.seq_len}, "
                  f"crop {args.img_dim}, {args.workers} workers)",
        "native": results.get("native"),
        "python": results.get("python"),
        "native_process": results.get("native-process"),
        "python_process": results.get("python-process"),
    }))


if __name__ == "__main__":
    main()
