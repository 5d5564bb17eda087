#!/bin/sh
# Extract jpg frames from a video at 24fps (reference demo_images/extract_frames.sh)
# usage: extract_frames.sh <video> <out_dir>
set -e
mkdir -p "${2:-./demo_images}"
ffmpeg -i "$1" -vf fps=24 -q:v 2 "${2:-./demo_images}/%03d.jpg"
