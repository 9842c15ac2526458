"""Versioned transaction-log manifest: one numbered action file per action.

Round-2 stored the manifest as a single appended ``_manifest/manifest.jsonl``.
On posix that append is atomic (O_APPEND), but object stores have no append —
the fallback was read-modify-write, so two concurrent committers (e.g. a
streaming sink batch plus a maintenance delete) could lose actions.  The
reference's txlog writes one versioned action file per commit
(native/src/txlog/actions.rs:25-37, txlog/mod.rs:1-8); this module mirrors
that shape:

    _manifest/00000000.json      <- one action per file
    _manifest/00000001.json
    ...

Appends allocate the next version number by listing the directory and
creating the file EXCLUSIVELY (posix: O_CREAT|O_EXCL; Hadoop FS:
``create(path, overwrite=false)``).  A concurrent writer that loses the race
gets an already-exists failure and retries with the next number — no action
is ever silently overwritten or dropped.  (On raw S3 without a consistency
layer, create-no-overwrite is a HEAD-then-PUT, the standard Hadoop contract;
the retry loop still closes the common interleavings and is strictly safer
than read-modify-write.)

Reads stay compatible with the legacy jsonl: its lines order BEFORE all
numbered actions, so a round-2 index keeps working and new actions append
after it.
"""

from __future__ import annotations

import json
import re
import time
import uuid
from typing import List, Optional

from tantivy4java_spark import fsio

_ACTION_FILE_RE = re.compile(r"^(\d{8})\.json$")
_LEGACY = "manifest.jsonl"

# write-verification for non-atomic create (raw S3's create-no-overwrite is
# HEAD-then-PUT): "auto" verifies on scheme'd (object-store) roots only;
# True forces it everywhere (tests simulate the racy create on posix).
WRITE_VERIFY = "auto"


def _verify_writes(index_dir: str) -> bool:
    if WRITE_VERIFY == "auto":
        return fsio.has_scheme(index_dir)
    return bool(WRITE_VERIFY)


def _dir(index_dir: str) -> str:
    return fsio.join(index_dir, "_manifest")


def exists(spark, index_dir: str) -> bool:
    """True when the index has any manifest actions (either format)."""
    d = _dir(index_dir)
    if not fsio.exists(spark, d):
        return False
    for name in fsio.listdir(spark, d):
        if name == _LEGACY or _ACTION_FILE_RE.match(name):
            return True
    return False


def read_actions(spark, index_dir: str) -> List[dict]:
    """All manifest actions in commit order: legacy jsonl lines first, then
    numbered action files sorted by version."""
    d = _dir(index_dir)
    if not fsio.exists(spark, d):
        return []
    names = fsio.listdir(spark, d)
    actions: List[dict] = []
    if _LEGACY in names:
        text = fsio.read_text(spark, fsio.join(d, _LEGACY))
        actions.extend(json.loads(line) for line in text.splitlines()
                       if line.strip())
    numbered = sorted((int(m.group(1)), n) for n in names
                      if (m := _ACTION_FILE_RE.match(n)))
    for _, name in numbered:
        actions.append(json.loads(fsio.read_text(spark, fsio.join(d, name))))
    return actions


def _next_version(spark, d: str) -> int:
    if not fsio.exists(spark, d):
        return 0
    versions = [int(m.group(1)) for n in fsio.listdir(spark, d)
                if (m := _ACTION_FILE_RE.match(n))]
    return (max(versions) + 1) if versions else 0


def append_action(spark, index_dir: str, action: dict,
                  max_retries: int = 1000) -> dict:
    """Durably append one action as the next ``_manifest/<version>.json``.

    Create-exclusive + retry: a lost race against a concurrent writer
    re-lists and takes the next free version, so both writers' actions
    survive (the round-2 read-modify-write could drop one).

    On object-store roots (where create-no-overwrite is HEAD-then-PUT, not
    atomic) every claimed version is READ BACK and compared against our
    payload — each action carries a unique ``txn`` token, so a PUT-PUT
    clobber is always detectable and the loser retries with the next
    version instead of silently losing its action.  Residual window on raw
    S3: both writers passing verification requires the second PUT to land
    after the first writer's read-back — narrowed by the post-create delay,
    eliminated entirely by any store with atomic create (posix, HDFS, abfs)
    or an If-None-Match layer."""
    d = _dir(index_dir)
    fsio.makedirs(spark, d)
    action = dict(action, ts=time.time(), txn=uuid.uuid4().hex)
    payload = json.dumps(action, sort_keys=True)
    verify = _verify_writes(index_dir)
    version = _next_version(spark, d)
    for _ in range(max_retries):
        path = fsio.join(d, f"{version:08d}.json")
        if fsio.create_text_exclusive(spark, path, payload):
            if not verify:
                return action
            time.sleep(0.01)  # let an in-flight racing PUT land first
            if fsio.read_text(spark, path) == payload:
                return action
            # non-atomic create lost a PUT-PUT race (another writer's txn
            # occupies this version) — our action is NOT durable; retry
        version = max(version + 1, _next_version(spark, d))
    raise RuntimeError(
        f"could not allocate a manifest version after {max_retries} "
        f"attempts under {d} (writer storm?)")


def last_commit_index(actions: List[dict]) -> int:
    """Index of the last ``commit`` action, -1 when never committed."""
    last = -1
    for i, a in enumerate(actions):
        if a.get("action") == "commit":
            last = i
    return last


def uncommitted_adds(actions: List[dict]) -> List[int]:
    """Segment ids added after the last commit that are still active
    (not rolled back) — the set a rollback would discard and a compaction
    must refuse to destroy."""
    from tantivy4java_spark.build import active_segments
    tail = actions[last_commit_index(actions) + 1:]
    active = set(active_segments(actions))
    out: List[int] = []
    for a in tail:
        sid = a.get("segment")
        if a.get("action") == "add" and sid in active and sid not in out:
            out.append(sid)
    return out
