#!/usr/bin/env python
"""Real-time face re-identification CLI (reference main.py surface).

Same flags as /root/reference/main.py:17-68, TPU-native execution.
See scrfd_arcface_facerecognition_tpu/apps/realtime.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scrfd_arcface_facerecognition_tpu.apps.realtime import main

if __name__ == "__main__":
    main()
