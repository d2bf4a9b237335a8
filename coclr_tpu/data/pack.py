"""msgpack record schema, byte-compatible with the reference datasets.

The reference wrote with msgpack 0.6.2 defaults (`use_bin_type=False`, so JPEG
byte strings are stored in the *raw/str* family) and reads with `raw=True`
semantics (README.md:142 warns about this for msgpack >= 1.0). We pack/unpack
with exactly those options so our files are byte-identical in schema and
reference files parse correctly here.
"""

from __future__ import annotations

from typing import Any

import msgpack


def packb(obj: Any) -> bytes:
    return msgpack.packb(obj, use_bin_type=False)


def unpackb(raw: bytes) -> Any:
    return msgpack.unpackb(raw, raw=True, strict_map_key=False)
