"""Column-name index: ordered names, dedup, generated names, column groups.

Reimplements the wrapper-level semantics of the reference's ``Index``
(reference src/index.jl:10-18): ordered column names with O(1) lookup,
``make_unique`` dedup (src/utils.jl:42-68), ``gennames`` auto names
x1,x2,… (src/utils.jl:70-72), and column *groups* — a name bound to a
set of columns usable anywhere a column name is (src/index.jl:113-140).

Spark has no analog for groups; they are expanded to column lists
before any plan is built, so Catalyst never sees them.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence


def make_unique(names: Sequence[str]) -> list[str]:
    """Deduplicate names by suffixing `_k` (reference src/utils.jl:42-68).

    First occurrence keeps its name; later duplicates get `name_1`,
    `name_2`, …, skipping suffixes that would collide with existing names.
    """
    seen: set[str] = set()
    out: list[str] = []
    counters: dict[str, int] = {}
    taken = set(names)
    for n in names:
        if n not in seen:
            seen.add(n)
            out.append(n)
            continue
        k = counters.get(n, 0) + 1
        cand = f"{n}_{k}"
        while cand in seen or cand in taken:
            k += 1
            cand = f"{n}_{k}"
        counters[n] = k
        seen.add(cand)
        out.append(cand)
    return out


def gennames(n: int) -> list[str]:
    """Generated column names x1..xn (reference src/utils.jl:70-72)."""
    return [f"x{i}" for i in range(1, n + 1)]


def clean_colname(name: str) -> str:
    """Regex-clean a column name: non-word chars → `_`
    (reference clean_colnames! src/dataframe.jl:1523-1528)."""
    import re

    return re.sub(r"\W", "_", name)


class Index:
    """Ordered name registry with column groups.

    Groups (reference set_group/get_groups/is_group, src/index.jl:113-140)
    let a single name stand for several columns in any column-selection
    position; ``expand`` resolves a selector to concrete column names.
    """

    def __init__(self, names: Iterable[str] = ()):  # noqa: D107
        self.names: list[str] = make_unique(list(names))
        self._groups: dict[str, list[str]] = {}

    # -- basic ops ---------------------------------------------------------
    def copy(self) -> "Index":
        new = Index(list(self.names))
        new._groups = {g: list(cols) for g, cols in self._groups.items()}
        return new

    def __len__(self) -> int:
        return len(self.names)

    def __contains__(self, name: str) -> bool:
        return name in self.names or name in self._groups

    def position(self, name: str) -> int:
        return self.names.index(name)

    def rename(self, mapping: dict[str, str]) -> "Index":
        """rename!/names! (reference src/index.jl:26-57)."""
        new = Index([mapping.get(n, n) for n in self.names])
        new._groups = {g: [mapping.get(c, c) for c in cols] for g, cols in self._groups.items()}
        return new

    # -- groups ------------------------------------------------------------
    def set_group(self, group: str, cols: Sequence[str]) -> None:
        missing = [c for c in cols if c not in self.names]
        if missing:
            raise KeyError(f"unknown columns in group {group!r}: {missing}")
        self._groups[group] = list(cols)

    def get_groups(self) -> dict[str, list[str]]:
        return dict(self._groups)

    def is_group(self, name: str) -> bool:
        return name in self._groups

    # -- selector resolution ----------------------------------------------
    def expand(self, selector) -> list[str]:
        """Resolve a column selector to concrete names.

        Accepts: name, group name, int position (0-based), bool mask,
        slice, or a list of any of those (reference Index.getindex
        src/index.jl:94-103).
        """
        if isinstance(selector, str):
            if selector in self._groups:
                return list(self._groups[selector])
            if selector not in self.names:
                raise KeyError(selector)
            return [selector]
        if isinstance(selector, int):
            return [self.names[selector]]
        if isinstance(selector, slice):
            return self.names[selector]
        if isinstance(selector, (list, tuple)):
            if selector and all(isinstance(x, bool) for x in selector):
                if len(selector) != len(self.names):
                    raise ValueError("bool mask length != ncol")
                return [n for n, keep in zip(self.names, selector) if keep]
            out: list[str] = []
            for x in selector:
                out.extend(self.expand(x))
            return out
        raise TypeError(f"unsupported column selector: {type(selector)}")
