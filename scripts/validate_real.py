"""CLI for real-image validation (reference: perseus/detector/validate_real.py)."""

from perseus_tpu.eval.validate_real import main

if __name__ == "__main__":
    main()
