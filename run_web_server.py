#!/usr/bin/env python
"""Web server launcher (reference run_web_server.py:10-49 equivalent).

Checks required files, builds the engine, serves on :8007.
"""
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    logging.basicConfig(level=logging.INFO)
    required = ["config.json"]
    missing = [f for f in required if not os.path.exists(f)]
    if missing:
        print(f"Note: missing optional files {missing}; using defaults")
    from scrfd_arcface_facerecognition_tpu.apps.webapp import run_web_server

    host = os.environ.get("SAFR_HOST", "0.0.0.0")
    port = int(os.environ.get("SAFR_PORT", "8007"))
    print("Starting Smart Face Recognition web server (TPU)")
    print(f"  http://{host}:{port}")
    run_web_server(host=host, port=port)


if __name__ == "__main__":
    main()
