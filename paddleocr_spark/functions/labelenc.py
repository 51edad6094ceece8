"""R5 train-side label encoders, as pure JVM column expressions.

Transcribes the deterministic text→id-array encoders from
``ppocr/data/imaug/label_ops.py`` (reference):

* ``BaseRecLabelEncode.encode`` (label_ops.py:97-171): with
  ``character_dict_path=None`` the dict is the 36-char
  ``"0123456789abcdefghijklmnopqrstuvwxyz"`` roster and ``lower`` is
  forced True; encode rejects empty or >max_text_len raw text, lowers,
  SKIPS out-of-dict chars (warning path), and rejects if nothing
  survives.  A rejected sample returns None and is dropped from the
  batch — rendered relationally here as NULL label columns (the row
  survives so the drop is visible and hashable).
* ``CTCLabelEncode`` (label_ops.py:173-206): 'blank' prepended (char
  ids shift +1), label padded with 0 to max_text_len, plus the
  ``label_ace`` histogram which counts the PADDED list — so slot 0
  (blank) always holds ``max_text_len - length``.
* ``AttnLabelEncode`` (label_ops.py:494-537): [sos]+dict+[eos]; extra
  reject when len >= max_text_len; label = [0]+ids+[eos]+0-pad to
  max_text_len... with the length-24 QUIRK: the pad count
  ``max_len - len - 2`` is -1 for len==24, Python's ``[0]*-1 == []``,
  so those labels are 26 long instead of 25.  Preserved bit-for-bit.
* ``SARLabelEncode`` (label_ops.py:894-935): dict + [<UKN>,
  <BOS/EOS>, <PAD>] appended (ids NOT shifted); reject when
  len >= max_text_len - 1; label = [start]+ids+[end] then <PAD>-filled
  to max_text_len.
* ``DetLabelEncode`` (label_ops.py:45-94): json label → (points,
  transcription) boxes; ignore_tags true iff transcription in
  {'*', '###'}; ``expand_points_num`` pads every box to the per-label
  max point count by repeating its LAST point; a label with zero boxes
  returns None (sample dropped).

Everything is whole-stage-codegen Spark SQL — no Python in the hot
path.  ``*_py`` twins exist only for the exec-reference differentials
(tests/test_reference_exec.py) and fixture tooling.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: label_ops.py:115-118 — the character_dict_path=None roster (lower=True).
ENC_CHARSET = "0123456789abcdefghijklmnopqrstuvwxyz"
MAX_TEXT_LEN = 25

_N = len(ENC_CHARSET)          # 36
_CTC_DICT_LEN = _N + 1         # + 'blank' at 0
_ATTN_EOS = _N + 1             # [sos] + 36 chars → eos at 37
_SAR_UKN = _N                  # appended specials: 36/37/38
_SAR_BOS_EOS = _N + 1
_SAR_PAD = _N + 2


def _ids_expr(text_col: str) -> str:
    """1-based dict positions of the surviving (lowered, in-dict) chars.

    ``instr`` is 1-based, which IS the CTC/Attn char id (both prepend one
    special); SAR subtracts 1.  Out-of-dict chars filter out — the
    encode loop's ``continue`` (label_ops.py:160-165).
    """
    return (f"filter(transform(split(lower(coalesce({text_col}, '')), ''), "
            f"c -> instr('{ENC_CHARSET}', c)), i -> i > 0)")


def _base_reject(text_col: str) -> Column:
    """encode()'s pre-filter reject: empty or over-long raw text
    (label_ops.py:152-153 — length checked BEFORE lowering/filtering)."""
    ln = F.length(F.coalesce(F.col(text_col), F.lit("")))
    return (ln == 0) | (ln > MAX_TEXT_LEN)


def with_ctc_label(df: DataFrame, text_col: str = "text") -> DataFrame:
    """CTCLabelEncode columns: ctc_label / ctc_length / ctc_ace.

    Arrays surface as comma-joined strings so the Spark and DuckDB
    sides hash identically.
    """
    ids = F.expr(_ids_expr(text_col))
    rejected = _base_reject(text_col) | (F.size(ids) == 0)
    padded = F.concat(ids, F.expr(
        f"array_repeat(0, {MAX_TEXT_LEN} - size({_ids_expr(text_col)}))"))
    # label_ace counts the PADDED list: slot 0 = max_len - length, slot i
    # = occurrences of char i-1 (label_ops.py:193-196).
    ace = F.expr(
        f"transform(sequence(0, {_CTC_DICT_LEN - 1}), s -> size(filter("
        f"concat({_ids_expr(text_col)}, array_repeat(0, {MAX_TEXT_LEN} - "
        f"size({_ids_expr(text_col)}))), x -> x = s)))")
    return df.withColumns({
        "ctc_label": F.when(rejected, F.lit(None))
        .otherwise(F.array_join(padded, ",")),
        "ctc_length": F.when(rejected, F.lit(None)).otherwise(F.size(ids)),
        "ctc_ace": F.when(rejected, F.lit(None))
        .otherwise(F.array_join(ace, ",")),
    })


def with_attn_label(df: DataFrame, text_col: str = "text") -> DataFrame:
    """AttnLabelEncode columns: attn_label / attn_length.

    Pins the len==24 quirk: pad count ``25 - len - 2`` floors at 0
    (Python's negative list-multiply), so a 24-char text yields a
    26-long label (label_ops.py:519-521).
    """
    ids = F.expr(_ids_expr(text_col))
    rejected = (_base_reject(text_col) | (F.size(ids) == 0)
                | (F.size(ids) >= MAX_TEXT_LEN))
    label = F.concat(
        F.array(F.lit(0)), ids, F.array(F.lit(_ATTN_EOS)),
        F.expr(f"array_repeat(0, greatest(0, {MAX_TEXT_LEN} - "
               f"size({_ids_expr(text_col)}) - 2))"))
    return df.withColumns({
        "attn_label": F.when(rejected, F.lit(None))
        .otherwise(F.array_join(label, ",")),
        "attn_length": F.when(rejected, F.lit(None)).otherwise(F.size(ids)),
    })


def with_sar_label(df: DataFrame, text_col: str = "text") -> DataFrame:
    """SARLabelEncode columns: sar_label / sar_length (ids unshifted;
    start/end id 37, pad id 38; reject at len >= 24)."""
    ids0 = F.expr(f"transform({_ids_expr(text_col)}, i -> i - 1)")
    ids = F.expr(_ids_expr(text_col))
    rejected = (_base_reject(text_col) | (F.size(ids) == 0)
                | (F.size(ids) >= MAX_TEXT_LEN - 1))
    label = F.concat(
        F.array(F.lit(_SAR_BOS_EOS)), ids0, F.array(F.lit(_SAR_BOS_EOS)),
        F.expr(f"array_repeat({_SAR_PAD}, {MAX_TEXT_LEN} - "
               f"size({_ids_expr(text_col)}) - 2)"))
    return df.withColumns({
        "sar_label": F.when(rejected, F.lit(None))
        .otherwise(F.array_join(label, ",")),
        "sar_length": F.when(rejected, F.lit(None)).otherwise(F.size(ids)),
    })


_DET_LABEL_SCHEMA = ("array<struct<transcription: string, "
                     "points: array<array<int>>>>")


def det_label_encode(df: DataFrame, label_col: str = "label") -> DataFrame:
    """DetLabelEncode as a relational op: one row per (sample, box).

    json.loads → per-box (points, transcription, ignore) with
    ``expand_points_num``'s repeat-last-point padding to the per-label
    max.  Zero-box labels return None in the reference (sample
    dropped): those input rows vanish here too.  Emits ``poly`` as the
    flattened "x,y,..." string of the float32 array.
    """
    parsed = df.withColumn(
        "_boxes", F.from_json(F.col(label_col), _DET_LABEL_SCHEMA))
    parsed = parsed.filter(F.size("_boxes") > 0)
    parsed = parsed.withColumn(
        "_maxpts", F.expr("array_max(transform(_boxes, b -> size(b.points)))"))
    box = parsed.select(
        *[c for c in df.columns if c != label_col],
        F.col("_maxpts"),
        F.posexplode("_boxes").alias("box_no", "_b"))
    return box.select(
        *[c for c in df.columns if c != label_col],
        "box_no",
        F.col("_b.transcription").alias("txt"),
        F.col("_b.transcription").isin("*", "###").alias("ignore_tag"),
        F.array_join(F.expr(
            "transform(flatten(concat(_b.points, "
            "array_repeat(element_at(_b.points, -1), "
            "_maxpts - size(_b.points)))), "
            "v -> cast(cast(v as int) as string))"), ",").alias("poly"),
    )


# ---------------------------------------------------------------------------
# Python twins — ONLY for the exec-reference differentials and fixtures.
# ---------------------------------------------------------------------------

def _encode_py(text: str) -> list[int] | None:
    if text is None:
        text = ""
    if len(text) == 0 or len(text) > MAX_TEXT_LEN:
        return None
    out = [ENC_CHARSET.find(c) for c in text.lower()]
    out = [i for i in out if i >= 0]
    return out or None


def vl_encode_py(text: str, seed: int):
    """VLLabelEncode (label_ops.py:1726-1784) under the seeded
    contract (round 5 — the 'random.sample occlusion draw, no
    deterministic contract' exclusion reason was wrong: a 1-element
    sample is one replayable _randbelow(len) draw).  Occludes ONE
    character of the RAW string (index drawn before any encode), then
    encodes the full / remaining / occluded strings with the usual
    +1 shift and 0-pad; an out-of-dict occluded char encodes to the
    empty list, exactly as the reference's None fallback.  Returns
    (change_id, length, length_res, length_sub, label, label_res,
    label_sub) or None for the reference's sample-drop."""
    import random as _random

    if text is None:
        text = ""
    len_str = len(text)
    if len_str <= 0:
        return None
    change_id = _random.Random(seed % (2 ** 32)).sample(
        range(len_str), 1)[0]
    label_sub_s = text[change_id]
    if change_id == (len_str - 1):
        label_res_s = text[:change_id]
    elif change_id == 0:
        label_res_s = text[1:]
    else:
        label_res_s = text[:change_id] + text[change_id + 1:]
    ids = _encode_py(text)
    if ids is None:
        return None
    ids = [i + 1 for i in ids]
    length = len(ids)
    label = ids + [0] * (MAX_TEXT_LEN - length)
    res = _encode_py(label_res_s)
    res = [] if res is None else [i + 1 for i in res]
    sub = _encode_py(label_sub_s)
    sub = [] if sub is None else [i + 1 for i in sub]
    length_res, length_sub = len(res), len(sub)
    label_res = res + [0] * (MAX_TEXT_LEN - len(res))
    label_sub = sub + [0] * (MAX_TEXT_LEN - len(sub))
    return (change_id, length, length_res, length_sub, label,
            label_res, label_sub)


def ctc_encode_py(text: str):
    ids = _encode_py(text)
    if ids is None:
        return None
    ids = [i + 1 for i in ids]
    length = len(ids)
    label = ids + [0] * (MAX_TEXT_LEN - length)
    ace = [0] * _CTC_DICT_LEN
    for x in label:
        ace[x] += 1
    return label, length, ace


def attn_encode_py(text: str):
    ids = _encode_py(text)
    if ids is None or len(ids) >= MAX_TEXT_LEN:
        return None
    ids = [i + 1 for i in ids]
    label = [0] + ids + [_ATTN_EOS] + [0] * (MAX_TEXT_LEN - len(ids) - 2)
    return label, len(ids)


def sar_encode_py(text: str):
    ids = _encode_py(text)
    if ids is None or len(ids) >= MAX_TEXT_LEN - 1:
        return None
    target = [_SAR_BOS_EOS] + ids + [_SAR_BOS_EOS]
    label = [_SAR_PAD] * MAX_TEXT_LEN
    label[:len(target)] = target
    return label, len(ids)


def det_label_encode_py(label: str):
    boxes = json.loads(label)
    if len(boxes) == 0:
        return None
    maxpts = max(len(b["points"]) for b in boxes)
    out = []
    for no, b in enumerate(boxes):
        pts = b["points"] + [b["points"][-1]] * (maxpts - len(b["points"]))
        out.append((no, b["transcription"],
                    b["transcription"] in ("*", "###"),
                    [float(v) for xy in pts for v in xy]))
    return out


# ---------------------------------------------------------------------------
# The rest of the deterministic rec-encoder roster (round-4 closing wave).
# VLLabelEncode joined in round 5 under the seeded contract
# (vl_encode_py below — its random.sample occlusion draw is one
# replayable _randbelow).  MultiLabelEncode is CTC+SAR composed (both
# columns here).
# ---------------------------------------------------------------------------

def _roster_label(ids_shift: int, prefix: list[int], suffix: list[int],
                  pad: int, target: int) -> str:
    """SQL for prefix ++ (ids+shift) ++ suffix ++ pad-fill to target,
    over a PRE-MATERIALIZED ``_ids`` column (inlining the split/filter
    expression once per family made Catalyst's tree quadratic — the
    first cut of rec_label_roster spent 100 s in analysis)."""
    lbl = f"transform(_ids, i -> i + {ids_shift})"
    if prefix:
        lbl = f"concat(array({', '.join(map(str, prefix))}), {lbl})"
    if suffix:
        lbl = f"concat({lbl}, array({', '.join(map(str, suffix))}))"
    fixed = len(prefix) + len(suffix)
    return (f"concat({lbl}, array_repeat({pad}, "
            f"{target} - {fixed} - size(_ids)))")


#: (name, ids_shift, prefix, suffix, pad, target, reject_n) — reject_n is
#: the post-filter length bound (None = base encode only); length output
#: per family notes below.
_ROSTER = {
    # SEED (label_ops.py:596-627): specials APPENDED (eos 36, pad 37,
    # unk 38); length = n+1 ("conclude eos"); eos+pad fill.
    "seed": (-1, [], [36], 37, 25, "n >= 25"),
    # SRN (:630-655): <BOS>/<EOS> appended; reject len > 25 (NOT >=);
    # eos(37)-padded, no terminator.
    "srn": (-1, [], [], 37, 25, "n > 25"),
    # NRTR (:1474-1502): [blank,<unk>,<s>,</s>] PREPENDED (ids +3);
    # <s>=2 / </s>=3 wrap; 0-pad; reject len >= 24.
    "nrtr": (3, [2], [3], 0, 25, "n >= 24"),
    # ViTSTR (:1505-1535): [<s>,</s>] prepended (ids +1); label is
    # max_len+2 = 27 long, wrapped ignore_index(0)/1.
    "vitstr": (1, [0], [1], 0, 27, "n >= 25"),
    # ABINet (:1538-1574, use_unknown=False): ['</s>'] prepended (ids
    # = instr); append </s>=0; fill ignore_index=100 to 26.
    "abinet": (0, [], [0], 100, 26, "n >= 25"),
    # SPIN (:1691-1723): [sos,eos] prepended (ids +1); [0]+ids+[1]
    # 0-padded to 27; reject len > 25 (NOT >=).
    "spin": (1, [0], [1], 0, 27, "n > 25"),
    # RFL (:540-593): Attn's dict/wrap — but the post-pad
    # ``len(text) != max_text_len → None`` check REJECTS n == 24 (where
    # Attn emits its 26-long quirk label); so effectively n >= 24.
    "rfl": (0, [0], [37], 0, 25, "n >= 24"),
}


def with_roster_labels(df: DataFrame, text_col: str = "text") -> DataFrame:
    """SEED/SRN/NRTR/ViTSTR/ABINet/SPIN/RFL label columns (comma-joined;
    NULL renders the reference's return-None sample drop), plus RFL's
    UNPADDED cnt histogram (unlike CTC's padded-list label_ace)."""
    tmp = df.withColumn("_ids", F.expr(_ids_expr(text_col)))
    n = F.size(F.col("_ids"))
    base_rej = _base_reject(text_col) | (n == 0)
    cols = {}
    for name, (shift, pre, suf, pad, target, extra) in _ROSTER.items():
        _, op, bound = extra.split()
        over = (n >= int(bound)) if op == ">=" else (n > int(bound))
        rej = base_rej | over
        arr = F.expr(_roster_label(shift, pre, suf, pad, target))
        cols[f"{name}_label"] = F.when(rej, F.lit(None)).otherwise(
            F.array_join(arr, ","))
        cols[f"{name}_length"] = F.when(rej, F.lit(None)).otherwise(
            n + 1 if name == "seed" else n).cast("long")
    rfl_rej = base_rej | (n >= MAX_TEXT_LEN - 1)
    cols["rfl_cnt"] = F.when(rfl_rej, F.lit(None)).otherwise(F.array_join(
        F.expr(f"transform(sequence(0, {_N + 1}), s -> size(filter("
               f"_ids, x -> x = s)))"), ","))
    return tmp.withColumns(cols).drop("_ids")


def with_pren_label(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PRENLabelEncode (label_ops.py:994-1038): its OWN encode — reject
    on RAW length (0 or >= 25, pre-lower); out-of-dict chars map to
    unknown_idx 2 (never skipped); ids = dict position + 3 specials;
    append <EOS>=1; <PAD>=0-fill to 25."""
    raw = F.length(F.coalesce(F.col(text_col), F.lit("")))
    rej = (raw == 0) | (raw >= MAX_TEXT_LEN)
    ids = (f"transform(split(lower(coalesce({text_col}, '')), ''), c -> "
           f"CASE WHEN instr('{ENC_CHARSET}', c) > 0 "
           f"THEN instr('{ENC_CHARSET}', c) + 2 ELSE 2 END)")
    arr = F.expr(f"concat({ids}, array(1), array_repeat(0, "
                 f"{MAX_TEXT_LEN} - 1 - size({ids})))")
    return df.withColumn(
        "pren_label",
        F.when(rej, F.lit(None)).otherwise(F.array_join(arr, ",")))


def with_can_label(df: DataFrame, text_col: str = "text") -> DataFrame:
    """CANLabelEncode (label_ops.py:1813-1839) with the default-dict
    quirks pinned: tokens are whitespace-split WORDS matched
    case-sensitively by LIST membership (only single chars can hit the
    roster — substring instr alone would false-match multi-char
    tokens); the appended '<EOS>' string is itself out-of-dict and
    VANISHES; __call__ never checks encode's None, so an all-skipped
    label yields label=None WITHOUT dropping the sample."""
    toks = (f"filter(split(trim(coalesce({text_col}, '')), '\\\\s+'), "
            f"t -> t != '')")
    ids = (f"filter(transform({toks}, t -> CASE WHEN length(t) = 1 "
           f"THEN instr('{ENC_CHARSET}', t) ELSE 0 END), i -> i > 0)")
    return df.withColumn(
        "can_label",
        F.when(F.expr(f"size({ids})") == 0, F.lit(None)).otherwise(
            F.array_join(F.expr(f"transform({ids}, i -> i - 1)"), ",")))


def with_cls_label(df: DataFrame, label_col: str,
                   label_list: tuple[str, ...] = ("0", "180")) -> DataFrame:
    """ClsLabelEncode (label_ops.py:32-42): list index or None-drop."""
    expr = F.lit(None)
    for i, lab in reversed(list(enumerate(label_list))):
        expr = F.when(F.col(label_col) == lab, F.lit(i)).otherwise(expr)
    return df.withColumn("cls_idx", expr.cast("long"))


# Python twins for the exec-reference differentials -------------------------

def roster_encode_py(name: str, text: str):
    shift, pre, suf, pad, target, extra = _ROSTER[name]
    ids = _encode_py(text)
    if ids is None:
        return None
    n = len(ids)
    _, op, bound = extra.split()
    if (n >= int(bound)) if op == ">=" else (n > int(bound)):
        return None
    arr = pre + [i + 1 + shift for i in ids] + suf
    arr = arr + [pad] * (target - len(arr))
    length = n + 1 if name == "seed" else n
    if name == "rfl":
        cnt = [0] * (_N + 2)
        for i in ids:
            cnt[i + 1] += 1
        return arr, length, cnt
    return arr, length


def pren_encode_py(text: str):
    if text is None:
        text = ""
    if len(text) == 0 or len(text) >= MAX_TEXT_LEN:
        return None
    out = []
    for c in text.lower():
        p = ENC_CHARSET.find(c)
        out.append(p + 3 if p >= 0 else 2)
    out.append(1)
    return out + [0] * (MAX_TEXT_LEN - len(out))


def can_encode_py(text: str):
    toks = (text or "").strip().split()
    toks.append("<EOS>")
    out = [ENC_CHARSET.find(t) for t in toks
           if len(t) == 1 and t in ENC_CHARSET]
    return out or None


# ---------------------------------------------------------------------------
# TableLabelEncode (the table-structure training encoder)
# ---------------------------------------------------------------------------

TABLE_MAX_LEN = 40           # max_text_length for the table query
_TD_TOKEN = ("<td>", "<td", "<eb></eb>", "<td></td>")


def table_label_encode_py(structure: list[str], cells: list[dict],
                          max_text_len: int = TABLE_MAX_LEN):
    """TableLabelEncode.__call__ (label_ops.py:674-823) twin over the
    repo's merged table dictionary (operators/table.py TABLE_DICT —
    sos/eos-wrapped, '<td></td>' merged), merge_no_span_structure=True,
    replace_empty_cell_token=False, learn_empty_box=False, loc_reg_num 4.

    Quirks transcribed:
    * ``_merge_no_span_structure`` (:789-804) rewrites '<td>' to
      '<td></td>' and UNCONDITIONALLY SKIPS the following token —
      whatever it is (even another '<td>', which therefore survives
      unmerged into the next iteration's append).
    * span tokens get a ' ' prefix only when missing (:744-747);
      empty-string tokens drop.
    * encode() rejects on the PRE-SKIP token count (> max), then skips
      out-of-dict tokens.
    * the post-pad ``len(structure) > _max_text_len`` re-check (:762)
      is DEAD — encode already bounded the length, sos/eos/pad land
      exactly on max+2; transcribed anyway.
    * FORK BUG pinned: TableLabelEncode.__init__ never calls super and
      never sets ``use_unkown``, but this fork's encode() reads
      ``self.use_unkown`` on every out-of-dict token (label_ops.py:160)
      — so an unknown structure token CRASHES the reference with
      AttributeError instead of being skipped.  This twin raises the
      same; the Spark operator documents a graceful-skip divergence
      (a relational op cannot crash per-row; unreachable for
      dict-valid labels).
    * the bbox walk runs over the PADDED id array; every td_token id
      consumes one cell; a cell contributes bbox+mask only when it has
      a bbox AND non-empty tokens (:771-784).  More td tokens than
      cells raises IndexError in the reference; the Spark form yields
      null-celled rows instead (documented divergence, unreachable for
      well-formed labels).
    """
    from ..operators.table import TABLE_DICT

    merged, i = [], 0
    while i < len(structure):
        token = structure[i]
        if token == "<td>":
            token = "<td></td>"
            i += 1
        merged.append(token)
        i += 1
    new_structure = []
    for token in merged:
        if token != "":
            if "span" in token and token[0] != " ":
                token = " " + token
            new_structure.append(token)
    if len(new_structure) == 0 or len(new_structure) > max_text_len:
        return None
    idx = {t: i for i, t in enumerate(TABLE_DICT)}
    ids = []
    for t in new_structure:
        if t not in idx:                    # fork bug: encode() reads the
            raise AttributeError(           # never-set use_unkown attr
                "'TableLabelEncode' object has no attribute 'use_unkown'")
        ids.append(idx[t])
    if not ids:
        return None
    eos = len(TABLE_DICT) - 1
    padded = [0] + ids + [eos]
    padded = padded + [0] * (max_text_len + 2 - len(padded))
    if len(padded) > max_text_len + 2:          # dead re-check (:762)
        return None
    td_ids = {idx[t] for t in _TD_TOKEN if t in idx}
    rows, bbox_idx = [], 0
    for i, tok in enumerate(padded):
        if tok in td_ids:
            cell = cells[bbox_idx]
            keep = ("bbox" in cell) and len(cell.get("tokens", [])) > 0
            rows.append((i, bbox_idx,
                         [float(v) for v in cell["bbox"]] if keep else None,
                         1.0 if keep else 0.0))
            bbox_idx += 1
    return padded, rows


def table_label_encode(df: DataFrame) -> DataFrame:
    """Spark form of :func:`table_label_encode_py`: input rows
    (t_id, structure array<string>, cells array<struct<has_bbox:
    boolean, ntokens: int, x1..y2: int>>) → one row per td token with
    the table's padded structure-id string alongside.  The sequential
    merge skip runs as an ``aggregate`` fold (exact; tables are
    grammar-bounded to tens of tokens, so the O(n²) accumulator copy is
    irrelevant here — unlike utf8_compose's document-length strings).
    Rejected tables (empty / over-long structure) drop, like the
    reference's return-None."""
    from ..operators.table import TABLE_DICT

    dict_lit = "array(" + ", ".join(
        f"'{t}'" for t in TABLE_DICT) + ")"
    eos = len(TABLE_DICT) - 1
    ml = TABLE_MAX_LEN
    merged = (
        "aggregate(structure, "
        "named_struct('out', cast(array() as array<string>), "
        "'skip', false), (acc, t) -> IF(acc.skip, "
        "named_struct('out', acc.out, 'skip', false), "
        "IF(t = '<td>', named_struct('out', "
        "concat(acc.out, array('<td></td>')), 'skip', true), "
        "named_struct('out', concat(acc.out, array(t)), 'skip', false))), "
        "acc -> acc.out)")
    out = df.withColumn("_new", F.expr(
        f"transform(filter({merged}, t -> t != ''), t -> "
        f"IF(contains(t, 'span') AND substring(t, 1, 1) != ' ', "
        f"concat(' ', t), t))"))
    out = out.filter((F.size("_new") > 0) & (F.size("_new") <= ml))
    out = out.withColumn("_ids", F.expr(
        f"filter(transform(_new, t -> array_position({dict_lit}, t) - 1), "
        f"i -> i >= 0)")).filter(F.size("_ids") > 0)
    out = out.withColumn("_padded", F.expr(
        f"concat(array(0), _ids, array({eos}), "
        f"array_repeat(0, {ml} - size(_ids)))"))
    td = out.select(
        "t_id", "cells",
        F.array_join(F.expr("transform(_padded, i -> cast(i as string))"),
                     ",").alias("structure"),
        F.posexplode(F.expr(
            "filter(transform(_padded, (tok, i) -> IF(tok IN (7, 12), i, "
            "-1)), p -> p >= 0)")).alias("cell_no", "pos"))
    return td.select(
        "t_id", "structure",
        F.col("pos").cast("long").alias("pos"),
        F.col("cell_no").cast("long").alias("cell_no"),
        F.expr("element_at(cells, cell_no + 1)").alias("_cell"),
    ).select(
        "t_id", "structure", "pos", "cell_no",
        F.when(F.col("_cell.has_bbox") & (F.col("_cell.ntokens") > 0),
               F.expr("concat_ws(',', _cell.x1, _cell.y1, _cell.x2, "
                      "_cell.y2)")).alias("bbox"),
        F.when(F.col("_cell.has_bbox") & (F.col("_cell.ntokens") > 0),
               F.lit(1.0)).otherwise(F.lit(0.0)).alias("bbox_mask"),
    )


def table_master_label_encode_py(structure: list[str], cells: list[dict],
                                 max_text_len: int = TABLE_MAX_LEN):
    """TableMasterLabelEncode twin (label_ops.py:823-853): specials
    APPENDED (<UKN>,<SOS>,<EOS>,<PAD> after the token dict, so raw token
    ids are 0-based unlike the sos-prefixed base class) and
    ``_max_text_len`` = max_text_len (NOT max+2) — which makes the
    post-pad ``len > _max_text_len`` re-check LIVE: a structure of
    max−1 or max tokens wraps to max+1/max+2 ids, the negative pad
    multiply yields [], and the re-check rejects — the exact check that
    is dead code in TableLabelEncode.  The use_unkown crash quirk is
    inherited (TableMaster's super chain still never sets it)."""
    from ..operators.table import TABLE_TOKENS

    merged, i = [], 0
    while i < len(structure):
        token = structure[i]
        if token == "<td>":
            token = "<td></td>"
            i += 1
        merged.append(token)
        i += 1
    new_structure = []
    for token in merged:
        if token != "":
            if "span" in token and token[0] != " ":
                token = " " + token
            new_structure.append(token)
    if len(new_structure) == 0 or len(new_structure) > max_text_len:
        return None
    idx = {t: i for i, t in enumerate(TABLE_TOKENS)}
    ids = []
    for t in new_structure:
        if t not in idx:
            raise AttributeError(
                "'TableMasterLabelEncode' object has no attribute "
                "'use_unkown'")
        ids.append(idx[t])
    if not ids:
        return None
    n_tok = len(TABLE_TOKENS)
    sos, eos, pad = n_tok + 1, n_tok + 2, n_tok + 3
    padded = [sos] + ids + [eos]
    padded = padded + [pad] * (max_text_len - len(padded))
    if len(padded) > max_text_len:          # LIVE re-check (:762 via :841)
        return None
    td_ids = {idx[t] for t in _TD_TOKEN if t in idx}
    rows, bbox_idx = [], 0
    for i, tok in enumerate(padded):
        if tok in td_ids:
            cell = cells[bbox_idx]
            keep = ("bbox" in cell) and len(cell.get("tokens", [])) > 0
            rows.append((i, bbox_idx,
                         [float(v) for v in cell["bbox"]] if keep else None,
                         1.0 if keep else 0.0))
            bbox_idx += 1
    return padded, rows


def table_master_label_encode(df: DataFrame) -> DataFrame:
    """Spark form of :func:`table_master_label_encode_py` — same fold,
    0-based token ids, appended specials, <PAD>-fill to max_text_len
    with the LIVE over-length drop."""
    from ..operators.table import TABLE_TOKENS

    dict_lit = "array(" + ", ".join(f"'{t}'" for t in TABLE_TOKENS) + ")"
    n_tok = len(TABLE_TOKENS)
    sos, eos, pad = n_tok + 1, n_tok + 2, n_tok + 3
    ml = TABLE_MAX_LEN
    merged = (
        "aggregate(structure, "
        "named_struct('out', cast(array() as array<string>), "
        "'skip', false), (acc, t) -> IF(acc.skip, "
        "named_struct('out', acc.out, 'skip', false), "
        "IF(t = '<td>', named_struct('out', "
        "concat(acc.out, array('<td></td>')), 'skip', true), "
        "named_struct('out', concat(acc.out, array(t)), 'skip', false))), "
        "acc -> acc.out)")
    out = df.withColumn("_new", F.expr(
        f"transform(filter({merged}, t -> t != ''), t -> "
        f"IF(contains(t, 'span') AND substring(t, 1, 1) != ' ', "
        f"concat(' ', t), t))"))
    out = out.filter((F.size("_new") > 0) & (F.size("_new") <= ml))
    out = out.withColumn("_ids", F.expr(
        f"filter(transform(_new, t -> array_position({dict_lit}, t) - 1), "
        f"i -> i >= 0)")).filter(F.size("_ids") > 0)
    # LIVE re-check: n+2 > max -> drop (negative array_repeat is empty)
    out = out.filter(F.size("_ids") + 2 <= ml)
    out = out.withColumn("_padded", F.expr(
        f"concat(array({sos}), _ids, array({eos}), "
        f"array_repeat({pad}, {ml} - 2 - size(_ids)))"))
    td_ids = ", ".join(str(i) for i, t in enumerate(TABLE_TOKENS)
                       if t in _TD_TOKEN)
    td = out.select(
        "t_id", "cells",
        F.array_join(F.expr("transform(_padded, i -> cast(i as string))"),
                     ",").alias("structure"),
        F.posexplode(F.expr(
            f"filter(transform(_padded, (tok, i) -> IF(tok IN ({td_ids}), "
            f"i, -1)), p -> p >= 0)")).alias("cell_no", "pos"))
    return td.select(
        "t_id", "structure",
        F.col("pos").cast("long").alias("pos"),
        F.col("cell_no").cast("long").alias("cell_no"),
        F.expr("element_at(cells, cell_no + 1)").alias("_cell"),
    ).select(
        "t_id", "structure", "pos", "cell_no",
        F.when(F.col("_cell.has_bbox") & (F.col("_cell.ntokens") > 0),
               F.expr("concat_ws(',', _cell.x1, _cell.y1, _cell.x2, "
                      "_cell.y2)")).alias("bbox"),
        F.when(F.col("_cell.has_bbox") & (F.col("_cell.ntokens") > 0),
               F.lit(1.0)).otherwise(F.lit(0.0)).alias("bbox_mask"),
    )


def e2e_label_encode_test(df: DataFrame, label_col: str = "label") \
        -> DataFrame:
    """E2ELabelEncodeTest (label_ops.py:244-283): Det-style json parse
    (NO expand_points_num — np.float32 on ragged point counts would
    crash the reference, so labels must be uniform-point) + per-box
    text encode padded with padnum=36.

    Quirks pinned: ANY box whose transcription rejects (empty, >25
    chars, or all out-of-dict — which includes every '*'/'###'
    ignore-tagged box!) returns None and drops the WHOLE sample; a
    ZERO-box label however survives (unlike DetLabelEncode's drop) —
    relationally it just contributes no rows."""
    parsed = df.withColumn(
        "_boxes", F.from_json(F.col(label_col), _DET_LABEL_SCHEMA))
    bad = (f"exists(_boxes, b -> length(b.transcription) = 0 OR "
           f"length(b.transcription) > {MAX_TEXT_LEN} OR "
           f"size(filter(transform(split(lower(b.transcription), ''), "
           f"c -> instr('{ENC_CHARSET}', c)), i -> i > 0)) = 0)")
    kept = parsed.filter(~F.expr(bad))
    box = kept.select(
        *[c for c in df.columns if c != label_col],
        F.posexplode("_boxes").alias("box_no", "_b"))
    ids = (f"filter(transform(split(lower(_b.transcription), ''), "
           f"c -> instr('{ENC_CHARSET}', c) - 1), i -> i >= 0)")
    return box.select(
        *[c for c in df.columns if c != label_col],
        "box_no",
        F.col("_b.transcription").alias("txt"),
        F.col("_b.transcription").isin("*", "###").alias("ignore_tag"),
        F.array_join(F.expr(
            "transform(flatten(_b.points), v -> cast(v as string))"),
            ",").alias("poly"),
        F.array_join(F.expr(
            f"concat({ids}, array_repeat({_N}, "
            f"{MAX_TEXT_LEN} - size({ids})))"), ",").alias("text_ids"),
    )


def e2e_label_encode_test_py(label: str):
    boxes = json.loads(label)
    out = []
    for no, b in enumerate(boxes):
        txt = b["transcription"]
        ids = _encode_py(txt)
        if ids is None:
            return None
        out.append((no, [float(v) for xy in b["points"] for v in xy],
                    txt, txt in ("*", "###"),
                    ids + [_N] * (MAX_TEXT_LEN - len(ids))))
    return out
