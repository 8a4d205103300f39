"""CLI for sim validation (reference: perseus/detector/validate.py)."""

from perseus_tpu.eval.validate import main

if __name__ == "__main__":
    main()
