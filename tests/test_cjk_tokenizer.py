"""CJK segmentation semantics (SURVEY §2 U1, RT/utils/KeywordUtil.java:15-34):
greedy forward longest-match over the bundled lexicon, latin runs kept
whole, punctuation dropped, unknown CJK chars emitted singly. The plain
-Python ``segment`` is the spec; the pandas_udf path must agree with it
on the fixture corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmallbiguan_parent_spark.functions.cjk import (
    CJK_FIXTURE_PHRASES,
    segment,
)


def test_longest_match_wins_at_shared_prefix():
    # 智能手机 (4) beats 智能?? no — 智能手机 is in the lexicon and must win
    # over segmenting as 智/能/手机.
    assert segment("智能手机促销") == ["智能手机", "促销"]
    # 智能手表 likewise beats 手表 alone after a greedy split point.
    assert segment("智能手表") == ["智能手表"]


def test_unknown_cjk_chars_emit_singly():
    # 壳 is not in the lexicon: 手机 matches, 壳 falls back to one char.
    assert segment("手机壳") == ["手机", "壳"]


def test_latin_runs_kept_whole_and_lowercased():
    assert segment("iPhone 15 Pro 手机壳") == ["iphone", "15", "pro", "手机", "壳"]
    assert segment("小米14手机") == ["小米", "14", "手机"]


def test_punctuation_and_whitespace_dropped():
    assert segment("平板电脑, 电视 和 音箱") == ["平板", "电脑", "电视", "和", "音箱"]


def test_pandas_udf_agrees_with_python_spec(spark):
    from gmallbiguan_parent_spark.functions import tokenize

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(CJK_FIXTURE_PHRASES)], "id long, phrase string"
    )
    got = {r.id: r.toks for r in df.select("id", tokenize("phrase", cjk=True).alias("toks")).collect()}
    want = {i: segment(p) for i, p in enumerate(CJK_FIXTURE_PHRASES)}
    assert got == want


# Property-based invariants (hypothesis): hold for ARBITRARY input, not
# just the fixture phrases.
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _text = st.text(
        alphabet=st.one_of(
            st.characters(min_codepoint=0x4E00, max_codepoint=0x4E80),  # CJK slice
            st.characters(min_codepoint=ord("a"), max_codepoint=ord("z")),
            st.characters(min_codepoint=ord("0"), max_codepoint=ord("9")),
            st.sampled_from(" ,.!-@#"),
        ),
        max_size=60,
    )

    @given(_text)
    @settings(max_examples=200, deadline=None)
    def test_segment_tokens_cover_only_input_chars(s):
        toks = segment(s)
        low = s.lower()
        # every token is a contiguous substring of the lowered input,
        # and tokens never contain separators
        for t in toks:
            assert t in low
            assert " " not in t

    @given(_text)
    @settings(max_examples=200, deadline=None)
    def test_segment_deterministic_and_total(s):
        assert segment(s) == segment(s)
        # total token length never exceeds input length
        assert sum(len(t) for t in segment(s)) <= len(s)

except ImportError:  # pragma: no cover - hypothesis is in the base image
    pass


def test_segment_expanded_lexicon_phrases():
    """Phrases built from the round-4 vocabulary expansion — none of
    these words existed in the original ~90-word lexicon (VERDICT r2
    next-round #6: exercise terms outside the bundled floor). The
    expectations encode BUNDLED-lexicon behavior, so skip when a full
    jieba dictionary is active."""
    import pytest

    try:
        import jieba  # noqa: F401
        pytest.skip("jieba active: segmentation follows the full dictionary")
    except ImportError:
        pass
    from gmallbiguan_parent_spark.functions.cjk import segment

    assert segment("扫地机器人静音耐用") == ["扫地机器人", "静音", "耐用"]
    assert segment("蓝牙耳机充电宝排行榜") == ["蓝牙耳机", "充电宝", "排行榜"]
    # longest-match at shared prefixes inside the new vocabulary
    assert segment("空气净化器和净化器") == ["空气净化器", "和", "净化器"]
    assert segment("羽绒服连衣裙优惠券满减") == ["羽绒服", "连衣裙", "优惠券", "满减"]
    # new word sharing a prefix with an old one: 优惠券 beats 优惠
    assert segment("优惠券") == ["优惠券"]
    assert segment("优惠活动") == ["优惠", "活动"]


def test_jieba_loader_gated():
    """The full-dictionary loader is import-gated: absent jieba it
    returns None and the bundled lexicon stays active."""
    from gmallbiguan_parent_spark.functions import cjk

    try:
        import jieba  # noqa: F401
    except ImportError:
        assert cjk._jieba_lexicon() is None
        assert cjk.CJK_LEXICON == cjk.CJK_LEXICON_BUNDLED
