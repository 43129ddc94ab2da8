"""Config + pickle readers (driver-side, not distributed).

Reference parity: ConfigReader YAML/JSON (src/bears/reader/config/
ConfigReader.py:15) and PickleReader (src/bears/reader/binary/PickleReader.py:12).
Configs are driver-side by nature; pickle payloads are discouraged
(OBJECT MLType) but kept for parity.
"""

from __future__ import annotations

import json
import pickle
from typing import Any


def read_config(path: str) -> Any:
    """YAML or JSON config by extension."""
    if path.endswith((".yaml", ".yml")):
        import yaml

        with open(path) as f:
            return yaml.safe_load(f)
    with open(path) as f:
        return json.load(f)


def write_config(obj: Any, path: str) -> None:
    if path.endswith((".yaml", ".yml")):
        import yaml

        with open(path, "w") as f:
            yaml.safe_dump(obj, f)
    else:
        with open(path, "w") as f:
            json.dump(obj, f, indent=2)


def read_pickle(path: str) -> Any:
    """Driver-side pickle load. Only for trusted, same-codebase payloads."""
    with open(path, "rb") as f:
        return pickle.load(f)


def write_pickle(obj: Any, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(obj, f)
