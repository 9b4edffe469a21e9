#!/bin/sh
# Split a video into a frame directory for the AR/propagation CLIs.
# Mirrors the reference's process_video.sh (same output layout:
# data/video_frames/<name>/%07d.png). Note the TPU CLIs can also read
# the .mp4 directly (gangealing_tpu/data/prepare.py::load_video_frames),
# so this is only needed for frame-level editing workflows.
set -e
file=${1:?usage: process_video.sh <video file>}
filename=$(basename "${file%.*}")
folder="data/video_frames/${filename}"
mkdir -p "${folder}"
ffmpeg -i "${file}" "${folder}/%07d.png"
