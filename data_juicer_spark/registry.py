"""Operator registry — mirrors the reference's ``OPERATORS = Registry``
semantics (/root/reference/data_juicer/ops/base_op.py:15) without its
runtime machinery: an op is a named factory ``(params) -> Operator`` whose
``apply(df)`` returns a transformed DataFrame (pure, lazy).
"""

from __future__ import annotations

from typing import Callable, Dict, List


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._ops: Dict[str, type] = {}

    def register(self, name: str) -> Callable[[type], type]:
        def deco(cls: type) -> type:
            if name in self._ops:
                raise ValueError(f"duplicate operator name: {name}")
            cls._op_name = name
            self._ops[name] = cls
            return cls

        return deco

    def get(self, name: str) -> type:
        if not self._ops and self.name == "Operators":
            # lazy self-population so `OPERATORS.get` works without an
            # explicit `import data_juicer_spark.operators`
            import data_juicer_spark.operators  # noqa: F401
        if name not in self._ops:
            raise KeyError(
                f"unknown operator '{name}'; known: {sorted(self._ops)}"
            )
        return self._ops[name]

    def names(self) -> List[str]:
        return sorted(self._ops)

    def __contains__(self, name: str) -> bool:
        return name in self._ops


OPERATORS = Registry("Operators")


def load_ops(process: List[dict]) -> list:
    """Instantiate operators from a config list of {op_name: kwargs} dicts
    — the reference's pipeline IR (/root/reference/data_juicer/ops/load.py).
    """
    import data_juicer_spark.operators  # noqa: F401  (populates registry)

    ops = []
    for entry in process:
        if isinstance(entry, str):
            name, kwargs = entry, {}
        else:
            (name, kwargs), = entry.items()
            kwargs = dict(kwargs or {})
        ops.append(OPERATORS.get(name)(**kwargs))
    return ops
