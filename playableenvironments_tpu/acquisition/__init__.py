"""Offline data-acquisition pipeline (SURVEY.md §2.h, layer L8).

Builds on-disk datasets in the framework's (reference-compatible) format:
- minecraft: ReplayMod-style recording JSON -> camera/object poses, projected
  boxes, frame extraction (dataset/acquisition/minecraft/*).
- tennis: planar-court camera calibration, detector-based player boxes,
  sequence extraction (dataset/acquisition/tennis/*, dataset/calibration/*).
- shared: train/val/test splitting and fixed-length fragmenting
  (dataset/acquisition/utils/*).
"""
