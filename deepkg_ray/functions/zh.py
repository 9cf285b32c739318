"""Chinese text path: traditional→simplified folding and dictionary-DP word
segmentation.

The reference normalizes Chinese with opencc t2s + full-width folding
(AutoPhraseX-main/autophrasex/tokenizer.py:17-39) and tokenizes with jieba +
a user dictionary (Normalization/recall BM25_Model.py:22-28); AutoNER's
annotation.h:16-243 implements the same maximal dictionary matching in C++.
Neither opencc nor jieba is in this container, so both are re-expressed from
their public semantics:

- ``T2S_TABLE``: a 1-char→1-char traditional→simplified mapping (the
  high-frequency subset of the OpenCC TSCharacters one-to-one entries).
  Being strictly 1:1 it composes with functions/textnorm.py's
  length-preserving invariant — spans over normalized text remain valid
  spans into the raw text.  Extend the table for fuller coverage; only
  1:1 entries are admissible (multi-char OpenCC entries would break the
  offset contract and are deliberately excluded).
- ``DictSegmenter``: jieba's exact DAG + max-log-prob dynamic program
  (public algorithm: build the word DAG from a prefix dictionary, then
  route[i] = max_j log(freq(w_ij)/total) + route[j], right to left),
  with single-char fallback for out-of-vocabulary runs.
"""

from __future__ import annotations

import math

# one-to-one traditional → simplified pairs (high-frequency subset)
_T2S_PAIRS = (
    "萬万與与醜丑專专業业叢丛東东絲丝丟丢兩两嚴严喪丧個个豐丰臨临為为麗丽"
    "舉举麼么義义烏乌樂乐喬乔習习鄉乡書书買买亂乱爭争於于虧亏雲云亞亚產产"
    "畝亩親亲褻亵億亿僅仅從从倫仑倉仓儀仪們们價价眾众優优會会傴伛傘伞偉伟"
    "傳传傷伤倀伥倆俩傖伧佇伫體体餘余傭佣僉佥俠侠侶侣僥侥偵侦側侧僑侨儈侩"
    "儕侪儂侬俁俣儼俨倀伥倉仓個个倆俩倈俫倫仑償偿儲储傑杰聽听僨偾僂偻賃赁"
    "頃顷預预庫库廬庐廢废開开異异棄弃張张彌弥彎弯歸归當当錄录彥彦徹彻徑径"
    "禦御憶忆懺忏憂忧愾忾懷怀態态慫怂憮怃慪怄悵怅愴怆憐怜總总懟怼懌怿戀恋"
    "恆恒懇恳惡恶慟恸懨恹愷恺惻恻惱恼惲恽悅悦愛爱慘惨懲惩憊惫愜惬慚惭憚惮"
    "慣惯湧涌蕩荡濱滨灘滩澀涩淚泪漢汉滿满濾滤濫滥灤滦濕湿潑泼澤泽涇泾潔洁"
    "灑洒窪洼浹浃淺浅漿浆澆浇湞浈濁浊測测澮浍濟济瀏浏滻浐渾浑滸浒濃浓潯浔"
    "請请諸诸諾诺讀读誰谁課课誶谇調调諂谄諒谅諄谆談谈誼谊謀谋諶谌諜谍謊谎"
    "語语誤误誘诱誨诲說说誦诵認认譏讥計计訂订訃讣議议訊讯記记講讲諱讳謳讴"
    "詎讵訝讶訥讷許许訛讹論论訟讼諷讽設设訪访訣诀證证評评識识詐诈訴诉診诊"
    "詞词詘诎詔诏譯译詒诒誆诓試试詩诗詰诘詿诖詢询該该詳详誇夸謗谤譫谵頭头"
    "買买賣卖貝贝貞贞負负貢贡財财責责賢贤敗败賬账貨货質质販贩貪贪貧贫貶贬"
    "購购貯贮貫贯鐵铁銀银錢钱鋼钢針针釘钉鈣钙鈍钝鈔钞鐘钟鋒锋銳锐錯错鍵键"
    "鎖锁鏈链鏡镜長长門门閃闪閉闭問问闖闯閏闰間间悶闷閘闸鬧闹閥阀閣阁閱阅"
    "闊阔隊队階阶際际陸陆陰阴陳陈雖虽雙双雛雏難难頁页頂顶項项順顺須须頑顽"
    "顯显風风飛飞飯饭飲饮餓饿館馆馬马駁驳驅驱駕驾騎骑騙骗驗验驚惊魚鱼鳥鸟"
    "雞鸡鳴鸣鴨鸭鵝鹅點点黨党齊齐齒齿龍龙龜龟車车軌轨軍军轉转輪轮輕轻載载"
    "較较輩辈輝辉輸输電电優优國国圖图圓圆團团場场塊块壓压壞坏壘垒墳坟壩坝"
    "報报聲声殼壳處处備备複复夠够頭头奪夺奮奋婦妇媽妈嫗妪姍姗姪侄媧娲嫻娴"
    "學学孫孙寧宁實实寵宠審审寫写寬宽對对尋寻導导壽寿將将爾尔塵尘嘗尝"
    # defaults whose exceptions live in T2S_PHRASES (opencc layering:
    # char table = default fold, phrase table = contextual overrides)
    "乾干瞭了髮发颱台鞦秋韆千藉借後后"
)
assert len(_T2S_PAIRS) % 2 == 0
T2S_TABLE: dict[int, int] = {ord(_T2S_PAIRS[i]): ord(_T2S_PAIRS[i + 1])
                             for i in range(0, len(_T2S_PAIRS), 2)
                             if _T2S_PAIRS[i] != _T2S_PAIRS[i + 1]}


def t2s(text: str) -> str:
    """Traditional→simplified fold, strictly length-preserving."""
    return text.translate(T2S_TABLE)


class DictSegmenter:
    """jieba-semantics dictionary segmentation (public algorithm; also the
    AutoNER annotation.h maximal-match semantics when all freqs are equal).

    Build: word → freq prefix dictionary.  Cut: DAG of in-dictionary spans,
    then the right-to-left dynamic program maximizing Σ log(freq/total);
    spans not covered by any word fall back to single chars.  Ties break
    toward the LONGER word (deterministic, matches jieba's behaviour of
    preferring longer routes at equal probability)."""

    def __init__(self, words: dict[str, int] | list[str]):
        if not isinstance(words, dict):
            words = {w: 1 for w in words}
        self.freq = {w: max(1, int(f)) for w, f in words.items() if w}
        self.total = max(1, sum(self.freq.values()))
        self.max_len = max((len(w) for w in self.freq), default=1)
        self._logtotal = math.log(self.total)

    def _logp(self, w: str) -> float:
        f = self.freq.get(w)
        # unknown single char: freq-1 smoothing (jieba uses min freq)
        return (math.log(f) if f else 0.0) - self._logtotal

    def cut(self, text: str) -> list[str]:
        n = len(text)
        if n == 0:
            return []
        # route[i] = (best score from i to end, chosen end j)
        route: list[tuple[float, int]] = [(0.0, 0)] * (n + 1)
        route[n] = (0.0, n)
        for i in range(n - 1, -1, -1):
            best = (self._logp(text[i]) + route[i + 1][0], i + 1)
            for j in range(i + 2, min(n, i + self.max_len) + 1):
                w = text[i:j]
                if w in self.freq:
                    score = self._logp(w) + route[j][0]
                    # >= : prefer the longer word on ties
                    if score >= best[0]:
                        best = (score, j)
            route[i] = best
        out = []
        i = 0
        while i < n:
            j = route[i][1]
            out.append(text[i:j])
            i = j
        return out

    def cut_batch(self, texts: list[str]) -> list[list[str]]:
        return [self.cut(t) for t in texts]


# --------------------------------------------------- phrase-level opencc ----

# OpenCC TSPhrases-style entries: multi-char phrases whose conversion is
# context-dependent — a per-char fold would be wrong on at least one char
# (e.g. 乾 → 干 in 乾燥 but stays 乾 in the proper noun 乾隆; 瞭 → 了 in
# 瞭解 but 瞭 in 瞭望).  Only length-preserving entries are admissible,
# keeping textnorm's span-offset contract intact (enforced below).
T2S_PHRASES: dict[str, str] = {
    # 乾: gān → 干 (dry) vs qián (trigram/proper noun) stays 乾
    "乾燥": "干燥",
    "乾杯": "干杯",
    "乾旱": "干旱",
    "乾淨": "干净",
    "乾脆": "干脆",
    "餅乾": "饼干",
    "乾隆": "乾隆",          # exception: proper noun keeps the traditional char
    "乾坤": "乾坤",          # exception: qián sense keeps the char
    # 瞭: liǎo → 了 (understand) vs liào (watch) stays 瞭
    "瞭解": "了解",
    "明瞭": "明了",
    "瞭如指掌": "了如指掌",
    "一目瞭然": "一目了然",
    "瞭望": "瞭望",          # exception: 瞭 is kept in this sense
    # 藉: jiè → 借 (by means of) vs jí/jiè in 狼藉/慰藉 stays 藉
    "藉口": "借口",
    "藉故": "借故",
    "藉助": "借助",
    "憑藉": "凭借",
    "狼藉": "狼藉",          # exception
    "慰藉": "慰藉",          # exception
    # 著: zhe/zháo → 着 vs zhù (writing) stays 著
    "著急": "着急",
    "著涼": "着凉",
    "著手": "着手",
    "著迷": "着迷",
    "接著": "接着",
    "跟著": "跟着",
    "沿著": "沿着",
    "穿著": "穿着",
    "執著": "执着",
    "著名": "著名",          # exception: zhù sense keeps the char
    "著作": "著作",          # exception
    # 覆: 回覆/答覆/反覆 use 复; 覆蓋-style cover senses keep 覆
    "回覆": "回复",
    "答覆": "答复",
    "反覆": "反复",
    # 傢: 傢俱/傢伙 simplify the SECOND char contextually too
    "傢俱": "家具",
    "傢伙": "家伙",
    "鞦韆": "秋千",
    "颱風": "台风",
    "頭髮": "头发",
    "皇後": "皇后",
}
assert all(len(k) == len(v) for k, v in T2S_PHRASES.items()), \
    "only length-preserving phrase entries are admissible"

_PHRASE_MAX = max((len(k) for k in T2S_PHRASES), default=0)
_PHRASE_FIRST = frozenset(k[0] for k in T2S_PHRASES)


def t2s_phrases(text: str, phrases: dict[str, str] | None = None) -> str:
    """opencc-style traditional→simplified conversion WITH phrase-level
    entries (AutoPhraseX tokenizer.py:17-39's opencc step beyond 1:1):
    greedy longest-match over the phrase table (opencc's segmentation
    conversion), per-char T2S_TABLE fallback between matches.  Strictly
    length-preserving (both the phrase entries and the char table are)."""
    if phrases is None:
        phrases = T2S_PHRASES
        first, pmax = _PHRASE_FIRST, _PHRASE_MAX
    else:
        first = frozenset(k[0] for k in phrases)
        pmax = max((len(k) for k in phrases), default=0)
    n = len(text)
    out: list[str] = []
    i = 0
    while i < n:
        ch = text[i]
        if ch in first:
            for l in range(min(pmax, n - i), 1, -1):   # longest first
                rep = phrases.get(text[i:i + l])
                if rep is not None:
                    out.append(rep)
                    i += l
                    break
            else:
                out.append(ch.translate(T2S_TABLE))
                i += 1
        else:
            out.append(ch.translate(T2S_TABLE))
            i += 1
    return "".join(out)
