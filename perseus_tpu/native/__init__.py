"""Native (C++) runtime components. See io.py for the batch image decoder."""
