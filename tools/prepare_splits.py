"""Split-metadata generator (the reference ships pre-built CSVs and tells
users to create their own — process_data/data/*/readme.md; this tool builds
them in the exact schema the datasets consume).

Outputs into --out:
  ucf101/hmdb51: {train,test}_split{01..03}.csv  rows "<frames_dir>/,nframes"
                 ClassInd.txt, and (ucf101) video_source.json sibling groups
  k400:          {train,val}_split.csv           rows "class/video,nframes"
                 ClassInd.txt

Usage:
  python tools/prepare_splits.py --dataset ucf101 --frames /data/ucf101/frame \
      --annotations /data/ucfTrainTestlist --out process_data/data/ucf101
  python tools/prepare_splits.py --dataset k400 --frames /data/k400/train_split \
      --split train --out process_data/data/k400
"""

import argparse
import glob
import json
import os
import sys


def count_frames(video_dir: str) -> int:
    return len(glob.glob(os.path.join(video_dir, "*.jpg")))


def write_csv(path, rows):
    with open(path, "w") as f:
        for p, n in rows:
            f.write("%s,%d\n" % (p, n))
    print("wrote %s (%d rows)" % (path, len(rows)))


def prepare_ucf101(frames: str, annotations: str, out: str):
    os.makedirs(out, exist_ok=True)
    # ClassInd from official classInd.txt ("<id> <name>")
    with open(os.path.join(annotations, "classInd.txt")) as f:
        classes = [l.strip().split(" ")[1] for l in f if l.strip()]
    with open(os.path.join(out, "ClassInd.txt"), "w") as f:
        f.write("\n".join(classes) + "\n")

    for split in (1, 2, 3):
        for mode, fname in (("train", "trainlist%02d.txt" % split),
                            ("test", "testlist%02d.txt" % split)):
            rows = []
            with open(os.path.join(annotations, fname)) as f:
                for line in f:
                    rel = line.strip().split(" ")[0]  # Class/v_X.avi
                    if not rel:
                        continue
                    vdir = os.path.join(frames, rel[:-4]
                                        if rel.endswith(".avi") else rel)
                    n = count_frames(vdir)
                    if n == 0:
                        continue
                    rows.append((vdir.rstrip("/") + "/", n))
            write_csv(os.path.join(out, "%s_split%02d.csv" % (mode, split)),
                      rows)

    # sibling groups: v_<Class>_g<GG>_c<CC> share source v_<Class>_g<GG>
    stems = sorted({os.path.basename(v).rsplit("_", 1)[0]
                    for v in glob.glob(os.path.join(frames, "*", "*"))})
    source = {}
    gid = 0
    for stem in stems:
        source[stem] = gid
        gid += 1
    # map each clip name to its group id
    mapping = {}
    for v in glob.glob(os.path.join(frames, "*", "*")):
        name = os.path.basename(v)
        mapping[name.rsplit("_", 1)[0]] = source[name.rsplit("_", 1)[0]]
    with open(os.path.join(out, "video_source.json"), "w") as f:
        json.dump(mapping, f)
    print("wrote video_source.json (%d groups)" % len(mapping))


def prepare_hmdb51(frames: str, annotations: str, out: str):
    os.makedirs(out, exist_ok=True)
    split_files = sorted(glob.glob(os.path.join(annotations,
                                                "*_test_split*.txt")))
    classes = sorted({os.path.basename(p).rsplit("_test_split", 1)[0]
                      for p in split_files})
    with open(os.path.join(out, "ClassInd.txt"), "w") as f:
        f.write("\n".join(classes) + "\n")

    for split in (1, 2, 3):
        train_rows, test_rows = [], []
        for cname in classes:
            path = os.path.join(annotations,
                                "%s_test_split%d.txt" % (cname, split))
            if not os.path.exists(path):
                continue
            with open(path) as f:
                for line in f:
                    parts = line.strip().split()
                    if len(parts) < 2:
                        continue
                    video, tag = parts[0], parts[1]
                    stem = video[:-4] if video.endswith(".avi") else video
                    vdir = os.path.join(frames, cname, stem)
                    n = count_frames(vdir)
                    if n == 0:
                        continue
                    row = (vdir.rstrip("/") + "/", n)
                    if tag == "1":
                        train_rows.append(row)
                    elif tag == "2":
                        test_rows.append(row)
        write_csv(os.path.join(out, "train_split%02d.csv" % split), train_rows)
        write_csv(os.path.join(out, "test_split%02d.csv" % split), test_rows)


def prepare_k400(frames: str, split: str, out: str):
    os.makedirs(out, exist_ok=True)
    classes = sorted(os.path.basename(d)
                     for d in glob.glob(os.path.join(frames, "*"))
                     if os.path.isdir(d))
    ci = os.path.join(out, "ClassInd.txt")
    if not os.path.exists(ci):
        with open(ci, "w") as f:
            f.write("\n".join(classes) + "\n")
    rows = []
    for cname in classes:
        for vdir in sorted(glob.glob(os.path.join(frames, cname, "*"))):
            n = count_frames(vdir)
            if n:
                rows.append(("%s/%s" % (cname, os.path.basename(vdir)), n))
    write_csv(os.path.join(out, "%s_split.csv" % split), rows)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True,
                   choices=["ucf101", "hmdb51", "k400"])
    p.add_argument("--frames", required=True, help="root of per-video jpg dirs")
    p.add_argument("--annotations", default="",
                   help="official split files (ucf101/hmdb51)")
    p.add_argument("--split", default="train", help="k400: train|val")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    if args.dataset == "ucf101":
        prepare_ucf101(args.frames, args.annotations, args.out)
    elif args.dataset == "hmdb51":
        prepare_hmdb51(args.frames, args.annotations, args.out)
    else:
        prepare_k400(args.frames, args.split, args.out)


if __name__ == "__main__":
    main()
