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
# This is an ORIGINAL authored vocabulary (~500 common e-commerce /
# consumer search words), not a lifted dictionary; a full production
# dictionary loads through _jieba_lexicon() below when available.
CJK_LEXICON_BUNDLED: tuple[str, ...] = (
    # devices / electronics
    "手机", "智能手机", "笔记本", "电脑", "平板", "电视", "冰箱", "洗衣机",
    "空调", "耳机", "充电器", "数据线", "键盘", "鼠标", "显示器", "相机",
    "手表", "智能手表", "音箱", "数码", "家电", "电器",
    "充电宝", "蓝牙", "蓝牙耳机", "无线", "无线耳机", "路由器", "摄像头",
    "投影仪", "打印机", "硬盘", "内存", "内存条", "显卡", "主板", "处理器",
    "芯片", "电池", "屏幕", "贴膜", "支架", "游戏机", "手柄", "麦克风",
    "音响", "电源", "插座", "插排", "读卡器", "优盘", "固态", "固态硬盘",
    "机械键盘", "游戏本", "一体机", "台式机", "平衡车", "无人机",
    "智能家居", "智能门锁", "门锁", "监控", "电子书", "阅读器", "学习机",
    "词典笔", "录音笔", "翻译机", "智能", "高清", "像素", "存储", "容量",
    "大屏", "全面屏", "折叠屏", "双卡", "快充", "续航", "拍照", "摄影",
    # appliances
    "电饭煲", "电磁炉", "微波炉", "烤箱", "空气炸锅", "破壁机", "榨汁机",
    "豆浆机", "热水器", "净水器", "加湿器", "除湿机", "吸尘器",
    "扫地机器人", "洗碗机", "消毒柜", "油烟机", "燃气灶", "电风扇", "风扇",
    "取暖器", "饮水机", "挂烫机", "熨斗", "剃须刀", "吹风机", "电吹风",
    "卷发棒", "电动牙刷", "牙刷", "按摩椅", "跑步机", "净化器",
    "空气净化器",
    # brands (public consumer brands, as in the reference's sample terms)
    "小米", "华为", "苹果", "三星", "荣耀",
    # books / media / stationery
    "图书", "小说", "文学", "历史", "科技", "教育", "少儿",
    "课本", "教材", "字典", "词典", "绘本", "漫画", "杂志", "钢笔",
    "圆珠笔", "中性笔", "铅笔", "橡皮", "文具", "书包", "笔袋", "尺子",
    "便利贴", "打印纸",
    # apparel / shoes
    "运动", "户外", "服装", "男装", "女装", "童装", "运动鞋", "皮鞋",
    "外套", "夹克", "风衣", "大衣", "羽绒服", "毛衣", "卫衣", "衬衫",
    "衬衣", "短袖", "长袖", "裤子", "牛仔裤", "休闲裤", "短裤", "裙子",
    "连衣裙", "半身裙", "内衣", "内裤", "袜子", "丝袜", "围巾", "手套",
    "帽子", "棒球帽", "腰带", "皮带", "领带", "西装", "西服", "礼服",
    "睡衣", "家居服", "泳衣", "球鞋", "跑鞋", "篮球鞋", "帆布鞋", "拖鞋",
    "凉鞋", "靴子", "雪地靴", "高跟鞋", "平底鞋", "板鞋", "童鞋",
    "速干", "冲锋衣",
    # bags
    "箱包", "背包", "手提包", "单肩包", "斜挎包", "双肩包", "钱包",
    "卡包", "行李箱", "拉杆箱", "旅行箱", "化妆包",
    # beauty / personal care
    "美妆", "护肤", "口红", "香水", "面膜", "爽肤水", "精华", "精华液",
    "乳液", "面霜", "眼霜", "防晒", "防晒霜", "隔离", "粉底", "粉底液",
    "气垫", "眉笔", "眼线笔", "睫毛膏", "腮红", "散粉", "卸妆", "卸妆水",
    "洗面奶", "洁面", "沐浴露", "洗发水", "护发素", "发膜", "身体乳",
    "润唇膏", "指甲油", "香氛", "精油",
    # food / drink
    "食品", "零食", "饮料", "牛奶", "咖啡", "茶叶", "水果", "生鲜",
    "大米", "面条", "方便面", "泡面", "饼干", "蛋糕", "面包", "巧克力",
    "糖果", "坚果", "瓜子", "花生", "核桃", "开心果", "薯片", "火锅",
    "调料", "酱油", "食用油", "橄榄油", "蜂蜜", "麦片", "燕麦", "奶粉",
    "酸奶", "奶酪", "黄油", "鸡蛋", "牛肉", "猪肉", "鸡肉", "羊肉",
    "海鲜", "螃蟹", "蔬菜", "香蕉", "橙子", "柠檬", "葡萄", "西瓜",
    "草莓", "蓝莓", "樱桃", "芒果", "榴莲", "红酒", "白酒", "啤酒",
    "葡萄酒", "果汁", "汽水", "可乐", "矿泉水", "纯净水", "绿茶", "红茶",
    "乌龙茶", "普洱", "花茶", "奶茶", "咖啡豆", "咖啡机", "无糖", "低脂",
    "有机", "天然", "新鲜",
    # home / kitchen / cleaning
    "家居", "家具", "厨具", "沙发", "床垫", "枕头", "被子", "床单",
    "被套", "四件套", "窗帘", "地毯", "地垫", "桌子", "椅子", "书桌",
    "书架", "衣柜", "鞋柜", "餐桌", "茶几", "台灯", "吊灯", "灯具",
    "灯泡", "装饰", "摆件", "花瓶", "相框", "收纳", "收纳盒", "衣架",
    "晾衣架", "垃圾桶", "垃圾袋", "保鲜膜", "保鲜盒", "水杯", "杯子",
    "保温杯", "马克杯", "餐具", "炒锅", "平底锅", "不粘锅", "高压锅",
    "砂锅", "菜刀", "刀具", "砧板", "锅铲", "毛巾", "浴巾", "牙膏",
    "香皂", "肥皂", "洗衣液", "洗衣粉", "柔顺剂", "洗洁精", "清洁剂",
    "拖把", "扫把", "抹布", "纸巾", "卷纸", "抽纸", "湿巾",
    # mother & baby / toys / mobility
    "奶瓶", "纸尿裤", "尿不湿", "婴儿车", "推车", "安全座椅", "玩具",
    "积木", "拼图", "娃娃", "毛绒", "模型", "手办", "遥控车", "滑板车",
    "自行车", "电动车", "摩托车", "头盔",
    # sports / outdoor
    "瑜伽", "瑜伽垫", "哑铃", "杠铃", "跳绳", "篮球", "足球", "排球",
    "羽毛球", "乒乓球", "网球", "帐篷", "睡袋", "登山", "登山鞋", "钓鱼",
    "鱼竿", "泳镜", "护膝", "护腕", "球拍", "球衣",
    # auto
    "汽车", "轮胎", "机油", "车载", "行车记录仪", "脚垫", "坐垫", "洗车",
    # health / optics
    "维生素", "钙片", "蛋白粉", "鱼油", "益生菌", "血压计", "体温计",
    "口罩", "创可贴", "眼药水", "隐形眼镜", "眼镜", "墨镜", "太阳镜",
    # commerce attributes / search modifiers
    "性价比", "新款", "旗舰", "旗舰店", "正品", "促销", "优惠", "便宜",
    "质量", "快递", "包邮", "评价", "推荐", "排行", "价格", "品牌",
    "官方", "官网", "专卖店", "套装", "礼盒", "礼物", "活动", "秒杀",
    "双十一", "爆款", "热卖", "热销", "畅销", "特价", "折扣", "满减",
    "红包", "优惠券", "清仓", "批发", "零售", "现货", "预售", "定制",
    "进口", "国产", "原装", "二手", "全新", "限量", "限时", "抢购",
    "团购", "拼团", "直播", "网红", "同款", "好评", "销量", "榜单",
    "排行榜", "热门", "流行", "时尚", "经典", "简约", "豪华", "高端",
    "低价", "实惠", "划算", "配送", "物流", "发货", "退货", "退款",
    "换货", "售后", "保修", "质保", "发票", "客服", "套餐", "组合",
    "散装", "盒装", "袋装", "瓶装", "整箱", "大容量", "便携", "轻薄",
    "耐用", "防水", "防摔", "静音", "节能", "省电", "环保", "健康",
    "安全", "舒适", "透气", "保暖", "清新", "美味", "好吃", "好用",
    "好看", "漂亮", "精美", "精致", "可爱", "个性", "创意", "实用",
    "多功能", "自动", "电动", "充电", "型号", "规格", "颜色", "黑色",
    "白色", "红色", "蓝色", "绿色", "粉色", "紫色", "灰色", "金色",
    "银色", "男士", "女士", "男款", "女款", "儿童", "成人", "老人",
    "学生", "情侣", "家用", "办公", "居家", "旅行", "旅游", "礼品",
    "赠品", "包装", "正版", "购买", "购物", "下单", "支付", "付款",
    "搜索", "对比", "年货", "春节", "国庆", "中秋", "元旦",
)


def _is_cjk(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def _jieba_lexicon(max_words: int = 20000) -> tuple[str, ...] | None:
    """Optional full-dictionary upgrade (VERDICT r2 next-round #6): when
    jieba is importable, its frequency dictionary replaces the bundled
    vocabulary — same seam, same greedy longest-match, and the DuckDB
    oracle CTE inlines whichever lexicon is ACTIVE, so the gate follows
    the dictionary. jieba is not bundled in this container, so the path
    is import-gated like the multimodal codec stubs; entries are
    filtered to pure-CJK words of 2+ chars and capped at max_words by
    descending frequency to bound the oracle's VALUES list."""
    try:
        import jieba  # noqa: F401 — optional, absent in this container
    except ImportError:
        return None
    entries: list[tuple[int, str]] = []
    with jieba.get_dict_file() as fh:
        for raw in fh:
            parts = raw.decode("utf-8").strip().split(" ")
            if len(parts) < 2:
                continue
            w = parts[0]
            if 2 <= len(w) <= 6 and all(_is_cjk(c) for c in w):
                entries.append((int(parts[1]), w))
    entries.sort(reverse=True)
    return tuple(w for _, w in entries[:max_words]) or None


# Active-lexicon resolution is LAZY and memoized: with jieba present,
# parsing/sorting its ~350k-entry dictionary is multi-second work that
# should run once on first segmentation use, not on every `import` of
# the package (executors unpickling unrelated UDFs included). The
# module attribute CJK_LEXICON resolves through __getattr__ below.
_ACTIVE_LEXICON: tuple[str, ...] | None = None
_LEX_STATE: tuple[frozenset, int] | None = None


def active_lexicon() -> tuple[str, ...]:
    global _ACTIVE_LEXICON
    if _ACTIVE_LEXICON is None:
        _ACTIVE_LEXICON = _jieba_lexicon() or CJK_LEXICON_BUNDLED
    return _ACTIVE_LEXICON


def _lex_state() -> tuple[frozenset, int]:
    """(word set, max word length) of the active lexicon, memoized."""
    global _LEX_STATE
    if _LEX_STATE is None:
        lex = active_lexicon()
        _LEX_STATE = (frozenset(lex), max(len(w) for w in lex))
    return _LEX_STATE


def __getattr__(name: str):
    if name == "CJK_LEXICON":
        return active_lexicon()
    raise AttributeError(name)

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

_LATIN_RUN = re.compile(r"[a-z0-9]+")


def segment(text: str, _state: tuple[frozenset, int] | None = None) -> list[str]:
    """Greedy longest-match segmentation — the reference algorithm the
    pandas_udf vectorizes and the DuckDB CTE replays. ``_state`` lets a
    closure pin the DRIVER's resolved lexicon (see tokenize_cjk_column);
    by default the process-local active lexicon is used."""
    lex_set, max_word = _state or _lex_state()
    t = text.lower()
    out: list[str] = []
    i, n = 0, len(t)
    while i < n:
        ch = t[i]
        if _is_cjk(ch):
            word = ch
            for ln in range(min(max_word, n - i), 1, -1):
                if t[i:i + ln] in lex_set:
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

    # The lexicon state is resolved HERE, on the driver, and travels in
    # the closure: executors segment with exactly the lexicon the
    # driver-side oracle CTE inlines, even if their Python environment
    # resolves jieba differently (or not at all).
    # no type hints: `from __future__ import annotations` stringifies
    # them and pyspark's hint parser rejects the strings — pass the
    # return type explicitly instead.
    state = _lex_state()

    def _seg(s):
        return s.map(lambda x: [] if x is None else segment(x, state))

    return F.pandas_udf(_seg, "array<string>")(col)


def duck_segment_cte(input_cte: str) -> str:
    """Recursive-CTE replay of ``segment`` for the oracle gate.

    ``input_cte`` must define ``inp(id, s)`` (s already lowercased).
    Produces ``toks(id, pos, tok)`` — one row per EMITTED token with its
    1-based character start position. The recursion carries the cursor;
    a LATERAL subquery picks, at each position: the longest lexicon
    word, else the maximal latin run, else one char (emitted only if
    CJK)."""
    lex_values = ", ".join(f"('{w}')" for w in active_lexicon())
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
