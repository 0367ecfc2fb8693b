"""AUID (area unique identifier) algebra, stdlib-only.

Reimplements the semantic contract of the reference's ``dggstools.auids``
package (/root/reference/dggstools/auids/common.py and rhpx.py) without
networkx: a sorted cuid list becomes a trie, serialized as a
balanced-parenthesis (BP) string, zlib-compressed and urlsafe-base64 encoded,
plus a blake2b-20 hash.  Duplicate cuids disappear "for free" in the trie
(common.py:193-197); sorting makes the AUID order-insensitive
(common.py:201-203).

The BP dialect matches the reference defaults: parentheses "¿?", root "^",
NIL terminator "$", no opening parentheses, trailing closing parentheses
stripped after the last "$" (common.py:21-27,206-208).
"""

from __future__ import annotations

import base64
import hashlib
import zlib
from typing import Iterable, Sequence

DEFAULT_PARS = "¿?"
DEFAULT_ROOT_NAME = "^"
DEFAULT_NIL_NAME = "$"
DEFAULT_HASH_DIGEST_SIZE = 20


# --------------------------------------------------------------------------
# trie
# --------------------------------------------------------------------------

def _build_trie(cuids: Iterable[str]) -> dict:
    """Nested-dict trie; the key "$" marks end-of-cuid (a leaf marker)."""
    root: dict = {}
    for cuid in sorted(set(cuids)):
        node = root
        for ch in cuid:
            node = node.setdefault(ch, {})
        node["$"] = True
    return root


def _trie_to_cuids(node: dict, prefix: str = "") -> list[str]:
    out = []
    for key in sorted(k for k in node if k != "$"):
        out.extend(_trie_to_cuids(node[key], prefix + key))
    if node.get("$"):
        out.append(prefix)
    return sorted(out) if prefix == "" else out


# --------------------------------------------------------------------------
# BP string serialization
# --------------------------------------------------------------------------

def _bp_from_trie(node: dict, pars: str, nil_name: str) -> str:
    """Children in sorted key order, NIL leaf rendered first when the node is
    itself a terminator — matching the reference's prefix-tree construction,
    where the NIL edge of a node is created when its cuid is inserted (sorted
    insertion puts the shorter cuid, hence the NIL edge, before its longer
    siblings)."""
    parts = []
    if node.get("$"):
        parts.append(nil_name + pars[1])
    for key in sorted(k for k in node if k != "$"):
        parts.append(key + _bp_from_trie(node[key], pars, nil_name) + pars[1])
    return "".join(parts)


def generate_bp_auid_from_cuids(
    cuids: Sequence[str],
    pars: str = DEFAULT_PARS,
    root_name: str = DEFAULT_ROOT_NAME,
    nil_name: str = DEFAULT_NIL_NAME,
    with_trailing_pars: bool = False,
) -> str:
    """cuids -> BP AUID string (reference common.py:180-213, opening pars off).

    The empty set has a well-defined canonical form: just the root (the
    reference never feeds an empty set; rfind would otherwise slice the
    string to '' and the decoder would choke on it)."""
    trie = _build_trie(cuids)
    if not trie:
        return root_name
    auid = root_name + _bp_from_trie(trie, pars, nil_name) + pars[1]
    if not with_trailing_pars:
        auid = auid[: auid.rfind(nil_name) + 1]
    return auid


def generate_cuids_from_bp_auid(
    bp_auid: str,
    pars: str = DEFAULT_PARS,
    root_name: str = DEFAULT_ROOT_NAME,
    nil_name: str = DEFAULT_NIL_NAME,
) -> list[str]:
    """BP AUID string -> sorted cuid list (reference common.py:220-245)."""
    # restore trailing closing parentheses: one per node char minus one per
    # existing closing par (common.py:228-240)
    count = 0
    for c in bp_auid:
        if c not in pars:
            count += 1
        elif c == pars[1]:
            count -= 1
    s = bp_auid + pars[1] * count
    assert s.startswith(root_name)
    # walk: a non-par char pushes a node, a closing par pops
    stack: list[str] = []
    cuids: list[str] = []
    for c in s[len(root_name):]:
        if c == pars[1]:
            if stack:
                popped = stack.pop()
                if popped == nil_name:
                    cuids.append("".join(stack))
        else:
            stack.append(c)
    return sorted(cuids)


# --------------------------------------------------------------------------
# encodings (urlsafe base64 / zlib / blake2b; reference common.py:81-114)
# --------------------------------------------------------------------------

def encode64(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).decode("utf-8")


def decode64(s: str) -> bytes:
    return base64.urlsafe_b64decode(s)


def hash_id(idstr: str, digest_size: int = DEFAULT_HASH_DIGEST_SIZE) -> tuple[bytes, str]:
    m = hashlib.blake2b(idstr.encode(), digest_size=digest_size)
    return m.digest(), encode64(m.digest())


def compress_id(idstr: str) -> bytes:
    return zlib.compress(idstr.encode("utf-8"))


def decompress_id_bytes(b: bytes) -> str:
    return zlib.decompress(b).decode("utf-8")


def generate_auid_hash_b64(cuids: Sequence[str]) -> tuple[str, str]:
    """cuids -> (compressed-AUID b64, blake2b-20 hash b64), the reference's
    ``AUIDGenerator.generate_auid_hash_b64`` (common.py:266-276)."""
    auid = generate_bp_auid_from_cuids(cuids)
    _, hashed_b64 = hash_id(auid)
    return encode64(compress_id(auid)), hashed_b64


def cuids_from_auid_b64(auid_comp_b64: str) -> list[str]:
    return generate_cuids_from_bp_auid(decompress_id_bytes(decode64(auid_comp_b64)))


# --------------------------------------------------------------------------
# rHEALPix-specific: optimize / is_optimal / subarea (reference auids/rhpx.py)
# --------------------------------------------------------------------------

def optimize_cuids(cuids: Sequence[str], n_side: int) -> list[str]:
    """Collapse complete sibling subtrees into their parent, bottom-up, until
    fixpoint (reference optimize_cuids_rhealpix, rhpx.py:108-181).  A node is
    collapsed when all ``n_side**2`` children exist and each is (after its own
    collapse) a pure leaf.  Base cells N..S never collapse into the root
    (rhpx.py:75-76)."""
    k = n_side * n_side

    def simplify(node: dict, is_root: bool) -> None:
        children = [key for key in node if key != "$"]
        for key in children:
            simplify(node[key], False)
        if is_root:
            return
        children = [key for key in node if key != "$"]
        if len(children) == k and all(
            len(node[key]) == 1 and node[key].get("$") for key in children
        ):
            for key in children:
                del node[key]
            node["$"] = True

    trie = _build_trie(cuids)
    simplify(trie, True)
    return _trie_to_cuids(trie)


def is_optimal_cuids(cuids: Sequence[str], n_side: int) -> bool:
    """True iff no complete collapsible subtree exists (reference
    is_optimal_cuids_rhealpix, rhpx.py:184-218)."""
    return optimize_cuids(cuids, n_side) == sorted(set(cuids))


def is_a_subarea(auid1_comp_b64: str, auid2_comp_b64: str,
                 nil_name: str = DEFAULT_NIL_NAME) -> bool:
    """Substring-containment subarea test on BP strings, split per base cell
    (reference is_a_subarea_rhealpix, rhpx.py:11-50).  May give false
    negatives for non-optimal inputs, like the reference.

    Documented deviation (bug fix): the reference matches each face's
    subtree text WITHOUT the face character, so the digits of face N also
    match identical digits under face O (verified: AUID(['N0']) reported as
    subarea of AUID(['O0'])) — a cross-face false positive.  The needle
    here is anchored with its face character, which is exactly why the
    reference splits per face in the first place (rhpx.py:33-37)."""
    import re

    auid1 = decompress_id_bytes(decode64(auid1_comp_b64))
    auid2 = decompress_id_bytes(decode64(auid2_comp_b64))
    pieces = re.split(r"([NOPQRS])", auid1)
    result = True
    for idx in range(1, len(pieces), 2):
        face = pieces[idx]
        sub = pieces[idx + 1]
        result = result and (face + sub[: sub.rfind(nil_name)] in auid2)
    return result
