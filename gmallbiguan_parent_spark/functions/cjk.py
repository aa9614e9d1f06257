"""CJK segmentation behind the ``tokenize`` seam (SURVEY §2 U1).

The reference's keyword pipeline runs an IK *Chinese* segmenter UDTF
(RT/utils/KeywordUtil.java:15-34, registered RT/app/dws2/
KeywordStatspp.java:36) over search terms; the latin regex tokenizer
that covers the driver testdata would shred Chinese phrases into
single characters. This module is the dictionary-based equivalent:
greedy forward longest-match over a bundled lexicon — the same
algorithm family as IK's smart mode — implemented three ways that must
agree exactly:

- ``segment`` (plain Python) — the spec, used by unit tests;
- an Arrow-batched pandas_udf (``tokenize_cjk_column``) — the Spark
  hot path: one Python worker round-trip per Arrow batch, never
  per-row;
- a recursive-CTE DuckDB replay (``duck_segment_cte``) — so the
  driver's oracle gate can verify the segmentation end-to-end.

Scan rules (mirrored in all three):
1. at a CJK char, take the LONGEST lexicon word starting there
   (lexicon words are all >=2 chars); if none, emit the single char;
2. at an ascii alnum char, consume the maximal [a-z0-9]+ run as one
   token (input is lowercased first);
3. anything else (punctuation, whitespace) advances one char and
   emits nothing.

The lexicon is a small e-commerce vocabulary matching the reference's
search-term domain (brand/category/attribute words); a production
deployment would swap in a full dictionary (e.g. jieba's) — the seam
and the plumbing don't change.
"""

from __future__ import annotations

import re

# >=2-char words only: single CJK chars are emitted by fallback rule 1,
# so listing them would be dead weight. Longest-match means longer
# entries win at a shared prefix (智能手机 beats 智能 beats 智).
CJK_LEXICON: tuple[str, ...] = (
    # devices / electronics
    "手机", "智能手机", "笔记本", "电脑", "平板", "电视", "冰箱", "洗衣机",
    "空调", "耳机", "充电器", "数据线", "键盘", "鼠标", "显示器", "相机",
    "手表", "智能手表", "音箱", "数码", "家电", "电器",
    # brands (public consumer brands, as in the reference's sample terms)
    "小米", "华为", "苹果", "三星", "荣耀",
    # books / media
    "图书", "小说", "文学", "历史", "科技", "教育", "少儿",
    # apparel / lifestyle
    "运动", "户外", "服装", "男装", "女装", "童装", "运动鞋", "皮鞋",
    "箱包", "背包", "美妆", "护肤", "口红", "香水",
    # home / food
    "家居", "家具", "厨具", "食品", "零食", "饮料", "牛奶", "咖啡",
    "茶叶", "水果", "生鲜",
    # commerce attributes
    "性价比", "新款", "旗舰", "旗舰店", "正品", "促销", "优惠", "便宜",
    "质量", "快递", "包邮", "评价", "推荐", "排行", "价格", "品牌",
    "官方", "官网", "专卖店", "套装", "礼盒", "礼物", "活动", "秒杀",
    "双十一",
)

# Gate-query fixture: the driver testdata documents are latin, so the
# CJK keyword query runs over this inline phrase set (reference-domain
# search terms, exercising every scan rule: longest-match vs shared
# prefixes, unknown single chars, latin runs, punctuation skips).
CJK_FIXTURE_PHRASES: tuple[str, ...] = (
    "小米手机性价比高",
    "华为旗舰店新款智能手机促销",
    "苹果笔记本电脑包邮",
    "三星显示器质量评价",
    "荣耀智能手表运动户外",
    "图书少儿教育推荐",
    "双十一零食饮料优惠活动",
    "男装运动鞋新款便宜",
    "美妆口红香水礼盒",
    "家电冰箱洗衣机空调套装",
    "iphone 15 pro 手机壳",
    "小米14手机数据线充电器",
    "咖啡牛奶水果生鲜快递",
    "官方正品耳机键盘鼠标",
    "历史小说文学排行",
    "平板电脑, 电视 和 音箱",
)

_LEX_SET = frozenset(CJK_LEXICON)
_MAX_WORD = max(len(w) for w in CJK_LEXICON)
_LATIN_RUN = re.compile(r"[a-z0-9]+")


def _is_cjk(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def segment(text: str) -> list[str]:
    """Greedy longest-match segmentation — the reference algorithm the
    pandas_udf vectorizes and the DuckDB CTE replays."""
    t = text.lower()
    out: list[str] = []
    i, n = 0, len(t)
    while i < n:
        ch = t[i]
        if _is_cjk(ch):
            word = ch
            for ln in range(min(_MAX_WORD, n - i), 1, -1):
                if t[i:i + ln] in _LEX_SET:
                    word = t[i:i + ln]
                    break
            out.append(word)
            i += len(word)
        else:
            m = _LATIN_RUN.match(t, i)
            if m:
                out.append(m.group(0))
                i = m.end()
            else:
                i += 1
    return out


def tokenize_cjk_column(col):
    """text column -> array<string> of segmented tokens, Arrow-batched.
    Built lazily (pandas_udf creation needs an active session)."""
    from pyspark.sql import functions as F

    # no type hints: `from __future__ import annotations` stringifies
    # them and pyspark's hint parser rejects the strings — pass the
    # return type explicitly instead.
    def _seg(s):
        return s.map(lambda x: [] if x is None else segment(x))

    return F.pandas_udf(_seg, "array<string>")(col)


def duck_segment_cte(input_cte: str) -> str:
    """Recursive-CTE replay of ``segment`` for the oracle gate.

    ``input_cte`` must define ``inp(id, s)`` (s already lowercased).
    Produces ``toks(id, pos, tok)`` — one row per EMITTED token with its
    1-based character start position. The recursion carries the cursor;
    a LATERAL subquery picks, at each position: the longest lexicon
    word, else the maximal latin run, else one char (emitted only if
    CJK)."""
    lex_values = ", ".join(f"('{w}')" for w in CJK_LEXICON)
    return f"""
    WITH RECURSIVE {input_cte},
    lex(w) AS (VALUES {lex_values}),
    walk(id, s, pos, tok, emit) AS (
        SELECT id, s, 1, CAST(NULL AS VARCHAR), FALSE FROM inp
        UNION ALL
        SELECT walk.id, walk.s, walk.pos + length(step.tok), step.tok, step.emit
        FROM walk,
        LATERAL (
            SELECT (SELECT w FROM lex
                    WHERE w = substr(walk.s, walk.pos, length(w))
                    ORDER BY length(w) DESC LIMIT 1) AS lex_w,
                   regexp_extract(substr(walk.s, walk.pos), '^[a-z0-9]+') AS run
        ) pre,
        LATERAL (
            SELECT COALESCE(pre.lex_w, NULLIF(pre.run, ''), substr(walk.s, walk.pos, 1)) AS tok,
                   (pre.lex_w IS NOT NULL OR pre.run <> ''
                    OR regexp_matches(substr(walk.s, walk.pos, 1), '[\\x{{4e00}}-\\x{{9fff}}]')) AS emit
        ) step
        WHERE walk.pos <= length(walk.s)
    ),
    toks AS (
        SELECT id, pos - length(tok) AS pos, tok
        FROM walk WHERE emit
    )
    """
