"""PNG frame sequence -> video (reference: tools/generate_video.py, cv2 @
5 fps). cv2 is not in this image; uses ffmpeg when present, else writes an
animated GIF via PIL."""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def main():
    p = argparse.ArgumentParser(description="frames -> video")
    p.add_argument("frames_dir")
    p.add_argument("out_path")
    p.add_argument("--fps", type=int, default=5)
    args = p.parse_args()

    if shutil.which("ffmpeg"):
        subprocess.run([
            "ffmpeg", "-y", "-framerate", str(args.fps),
            "-pattern_type", "glob", "-i",
            os.path.join(args.frames_dir, "*.png"),
            "-c:v", "libx264", "-pix_fmt", "yuv420p", args.out_path,
        ], check=True)
        return
    from PIL import Image

    names = sorted(n for n in os.listdir(args.frames_dir) if n.endswith(".png"))
    if not names:
        sys.exit("no frames found")
    imgs = [Image.open(os.path.join(args.frames_dir, n)) for n in names]
    gif_path = args.out_path if args.out_path.endswith(".gif") \
        else args.out_path + ".gif"
    imgs[0].save(gif_path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / args.fps), loop=0)
    print(f"ffmpeg unavailable; wrote {gif_path}")


if __name__ == "__main__":
    main()
