"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Schema exactly per BASELINE.json.input_hint:

    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string, ts timestamp)

- turns per conversation ~ Zipf(a=1.5) clipped to [1, 400] — the skewed
  conversations the north rule requires explicit skew handling for;
- tool vocabulary: 50 tools, Zipf(a=1.3) — CMS heavy hitters;
- text unique per (conv_id, turn_idx) ⇒ exact distinct truth == row count;
- ts = 2026-01-01T00:00:00Z + conv offset + cumulative per-turn gap ∈ [1,300]s;
- all entropy from ``numpy.default_rng(seed)`` — no wall clock anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BASE_TS = 1767225600  # 2026-01-01T00:00:00Z

_WORDS = np.array(
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber basalt cedar dune ember flint grove harbor inlet "
    "juniper krill lagoon mesa nectar onyx prairie quartz ridge summit thicket "
    "umber vale willow xenon yarrow zephyr".split()
)


def generate_transcripts(
    n_conversations: int = 10_000, seed: int = 42
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)

    turns = np.clip(rng.zipf(1.5, size=n_conversations), 1, 400).astype(np.int64)
    total = int(turns.sum())

    conv_idx = np.repeat(np.arange(n_conversations, dtype=np.int64), turns)
    # dense turn_idx per conversation
    starts = np.concatenate([[0], np.cumsum(turns)[:-1]])
    turn_idx = (np.arange(total, dtype=np.int64) - starts[conv_idx]).astype(np.int32)

    # string columns via small lookup tables (vectorized take, not per-row format)
    conv_lut = np.array(["conv-%08d" % i for i in range(n_conversations)])
    conv_ids = conv_lut[conv_idx]

    # roles: cycle user/assistant; ~10% of rows become 'tool' rows
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype("U9")
    tool_rows = rng.random(total) < 0.10
    role[tool_rows] = "tool"

    # tools: Zipf(1.3) over 50 tools (tail wrapped, keeping tool-00 heaviest),
    # only on assistant rows; '' otherwise
    tool_lut = np.array(["tool-%02d" % i for i in range(50)])
    tool_id = (rng.zipf(1.3, size=total) - 1) % 50
    tool = np.where(role == "assistant", tool_lut[tool_id], "")

    # text: "conv-XXXXXXXX/tNNNN: " + 6 rng-drawn words → unique per turn
    turn_lut = np.array(["/t%04d: " % t for t in range(401)])
    widx = rng.integers(0, len(_WORDS), size=(total, 6))
    sentence = _WORDS[widx[:, 0]]
    for j in range(1, 6):
        sentence = np.char.add(np.char.add(sentence, " "), _WORDS[widx[:, j]])
    text = np.char.add(np.char.add(conv_ids, turn_lut[turn_idx]), sentence)

    # ts: conversation offset (spread over ~30 days) + cumulative gaps [1,300]s
    conv_offset = rng.integers(0, 30 * 86400, size=n_conversations)
    gaps = rng.integers(1, 301, size=total)
    gap_cum = np.cumsum(gaps)
    conv_gap_base = np.concatenate([[0], gap_cum[np.cumsum(turns)[:-1] - 1]])
    within = gap_cum - conv_gap_base[conv_idx]
    ts_sec = BASE_TS + conv_offset[conv_idx] + within

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pd.to_datetime(ts_sec, unit="s", utc=True).tz_localize(None),
        }
    )


def write_transcripts_parquet(
    path: str, n_conversations: int = 10_000, seed: int = 42, n_files: int = 32
) -> int:
    """Write the transcripts table as a directory of ``n_files`` Parquet
    files (so a local Spark read gets that many input splits); returns row
    count."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = generate_transcripts(n_conversations, seed)
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    # Spark cannot read ns-precision parquet timestamps
    i = tbl.schema.get_field_index("ts")
    tbl = tbl.set_column(i, "ts", tbl.column("ts").cast(pa.timestamp("us")))
    os.makedirs(path, exist_ok=True)
    n = len(pdf)
    step = -(-n // n_files)
    for f in range(n_files):
        chunk = tbl.slice(f * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, f"{path}/part-{f:04d}.parquet")
    return n
