"""Config-validation CLI — the reference's standalone validator
(configuration_validator.py:1-27) re-expressed over dawis_spark.config:
validate a YAML configuration file without touching Spark or any warehouse.

Usage: python tools/validate_config.py <config.yml>
Exit 0 and print "configuration valid" when the file parses and passes
shape validation; exit 1 with the first human-readable problem otherwise
(same outcomes as the reference: missing argument, missing file, invalid
configuration)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    if not argv:
        print("pass a configuration file as argument")
        return 1
    path = argv[0]
    if not os.path.isfile(path):
        print(f'configuration file "{path}" does not exist')
        return 1
    from dawis_spark.config import load_configuration

    try:
        with open(path, encoding="utf-8") as fh:
            cfg = load_configuration(fh.read())
    except ValueError as exc:
        print(f'configuration is invalid: "{exc}"')
        return 1
    except Exception as exc:  # yaml parse errors and friends
        print(f'configuration is invalid: "{exc}"')
        return 1
    n_urlsets = len(cfg.urlsets)
    n_mods = len(cfg.aggregations) + len(cfg.operations)
    print(f"configuration valid: {n_urlsets} urlsets, {n_mods} modules, hash {cfg.hash[:12]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
