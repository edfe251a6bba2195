"""CLI entry point (same flag surface as the reference main.py)."""

from pdgn_tpu.cli import main

if __name__ == "__main__":
    main()
