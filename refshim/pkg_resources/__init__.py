"""Minimal pkg_resources surface for the reference (metayolo/__init__.py:95
``parse_version``; engines/general.py:249,256 ``parse_requirements`` /
``require`` inside the never-exercised check_requirements path)."""

import re


class _Version(tuple):
    def __new__(cls, s):
        parts = []
        for tok in re.split(r"[.\-+]", str(s)):
            m = re.match(r"(\d+)", tok)
            parts.append(int(m.group(1)) if m else 0)
        return super().__new__(cls, tuple(parts) or (0,))

    def __eq__(self, other):
        a, b = _pad(self, other)
        return a == b

    def __lt__(self, other):
        a, b = _pad(self, other)
        return a < b

    def __le__(self, other):
        return self == other or self < other

    def __gt__(self, other):
        return not self <= other

    def __ge__(self, other):
        return not self < other

    def __hash__(self):
        return hash(tuple(self))


def _pad(a, b):
    n = max(len(a), len(b))
    return tuple(a) + (0,) * (n - len(a)), tuple(b) + (0,) * (n - len(b))


def parse_version(s):
    return _Version(s)


class DistributionNotFound(Exception):
    pass


class VersionConflict(Exception):
    pass


def parse_requirements(f):
    raise DistributionNotFound("pkg_resources shim: no package metadata available")


def require(r):
    raise DistributionNotFound("pkg_resources shim: no package metadata available")
