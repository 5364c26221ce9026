"""``python -m janet_ray`` → the CLI (janet_ray/cli.py)."""

from janet_ray.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
