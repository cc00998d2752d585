"""Atomic first-touch publication for digest-keyed served layouts.

Every served index/layout in the engine (geo cells, range clustering,
SimHash/MinHash/dHash band indexes, IVF/PQ inverted lists) is built
lazily on first touch at a location named by a digest of its parameters
+ corpus fingerprint. The build itself is many filesystem mutations
(parquet files, partition dirs, sidecars, _SUCCESS) — two concurrent
first touches writing the same location in place can interleave
overwrite-deletes and commit a DUPLICATED or torn layout under a green
_SUCCESS marker.

``publish_layout_atomic`` is the one shared protocol (VERDICT r14 #2 —
dq21's unique-stage + single ``os.rename`` pattern, extracted): build
into a (pid, thread)-unique sibling, publish with one atomic directory
rename. The loser of a concurrent race fails the rename (POSIX rename
onto an existing non-empty directory) and discards its staging; the
winner's layout is the only one ever visible, and it is visible only
complete.

Reference: the same stage-then-move discipline Druid's segment pusher
uses for deep-storage segment directories (druid docs, segment
lifecycle [recall]).
"""

from __future__ import annotations

import os
import shutil
import threading
from typing import Callable, Optional


def publish_layout_atomic(
    final: str,
    build: Callable[[str], None],
    is_complete: Optional[Callable[[str], bool]] = None,
) -> bool:
    """Build a layout dir in a unique sibling and publish atomically.

    ``build(stage_path)`` must create ``stage_path`` (a sibling of
    ``final``) and write the COMPLETE layout into it — data files and
    every sidecar the readers consult — so the single ``os.rename``
    makes the whole layout appear at once. The stage name carries pid
    AND thread id (r15 self-review: pid alone let two threads of one
    driver share a stage — the second thread's leftover-sweep deleted
    the first's live build, recreating intra-process exactly the torn
    publish this helper exists to prevent).

    ``is_complete(final)`` — the caller's own completeness test (the
    same marker check that gated the build: ``_SUCCESS``,
    ``_meta.json``, ``_ivf_meta.json``…). It decides what a failed
    rename MEANS (r15 self-review): a complete dir at ``final`` is a
    concurrent winner (this build is discarded, return ``False``); an
    INCOMPLETE dir is a torn pre-protocol leftover that would otherwise
    wedge the location forever — it is swapped aside and replaced by
    this build. Without the predicate a failed rename is conservatively
    treated as a winner (never deletes data it cannot judge).

    Returns ``True`` if this call's build was published, ``False`` if a
    concurrent first touch won (its complete layout is live —
    digest-keyed locations guarantee both builds carry identical
    parameters, so the winner serves the loser's reads correctly).
    """
    stage = f"{final}.tmp.{os.getpid()}.{threading.get_ident()}"
    if os.path.isdir(stage):
        # this (pid, thread)'s own crashed leftovers only: a live thread
        # has a distinct ident, and a dead thread whose ident was reused
        # cannot still be writing
        shutil.rmtree(stage)
    parent = os.path.dirname(final)
    if parent:
        os.makedirs(parent, exist_ok=True)
    build(stage)
    try:
        os.rename(stage, final)
        return True
    except OSError:
        if is_complete is not None and not is_complete(final):
            # torn dir at final (a pre-protocol crash, or a vanished
            # competitor): swap it aside, publish this complete build,
            # then clear the wreck. If a concurrent racer swapped it
            # first, fall through to the winner check below.
            wreck = f"{final}.torn.{os.getpid()}.{threading.get_ident()}"
            try:
                os.rename(final, wreck)
            except OSError:
                wreck = None
            try:
                os.rename(stage, final)
                return True
            except OSError:
                pass  # a racer published between our two renames
            finally:
                if wreck is not None:
                    shutil.rmtree(wreck, ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)
        return False
