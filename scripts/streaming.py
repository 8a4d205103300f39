"""CLI for the live streaming runtime (reference: scripts/streaming.py)."""

from perseus_tpu.runtime.streaming import main

if __name__ == "__main__":
    main()
