"""CLI for detector training (reference: perseus/detector/train.py)."""

from perseus_tpu.train.train import main

if __name__ == "__main__":
    main()
