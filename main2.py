#!/usr/bin/env python
"""Dual-camera re-identification CLI (reference main2.py surface)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scrfd_arcface_facerecognition_tpu.apps.dualstream import main

if __name__ == "__main__":
    main()
