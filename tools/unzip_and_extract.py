"""Dataset bootstrap: md5-checked unzip + video frame extraction
(reference: tools/unzip_and_extract.py). cv2 is not in this image; frame
extraction shells out to ffmpeg when videos need decoding."""
from __future__ import annotations

import argparse
import hashlib
import os
import shutil
import subprocess
import zipfile


def md5sum(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def unzip(zip_path: str, out_dir: str, expected_md5: str | None = None):
    if expected_md5:
        actual = md5sum(zip_path)
        if actual != expected_md5:
            raise ValueError(f"{zip_path}: md5 {actual} != expected {expected_md5}")
    os.makedirs(out_dir, exist_ok=True)
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(out_dir)


def extract_frames(video_path: str, out_dir: str, fps: int = 5):
    if not shutil.which("ffmpeg"):
        raise RuntimeError("ffmpeg not available for frame extraction")
    os.makedirs(out_dir, exist_ok=True)
    subprocess.run([
        "ffmpeg", "-y", "-i", video_path, "-vf", f"fps={fps}",
        "-start_number", "0", os.path.join(out_dir, "%04d.png"),
    ], check=True)


def main():
    p = argparse.ArgumentParser(description="dataset bootstrap")
    p.add_argument("--zip", default=None)
    p.add_argument("--md5", default=None)
    p.add_argument("--out", default="./data")
    p.add_argument("--video", default=None)
    p.add_argument("--frames-out", default=None)
    p.add_argument("--fps", type=int, default=5)
    args = p.parse_args()
    if args.zip:
        unzip(args.zip, args.out, args.md5)
        print(f"extracted {args.zip} -> {args.out}")
    if args.video:
        extract_frames(args.video, args.frames_out or args.out, args.fps)


if __name__ == "__main__":
    main()
