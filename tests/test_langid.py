"""Language ID (functions/langid.py): full 53-reference-profile
classifier accuracy on planted multilingual fixtures + exact
DuckDB-twin parity.

Reference analog: com/cybozu/labs/langdetect/Detector.java (53 n-gram
profiles); our classifier emits every one of the reference's 53 codes
(plus 7 extra script-unique languages) via script-block detection,
shared-script marker/probe splits (zh-cn/zh-tw, ar/fa/ur, ru/uk/bg/mk,
hi/mr/ne) and a Latin stopword argmax (see the module docstring).
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from simhash_text_dedup_spark.functions.langid import (
    ALL_LANGS,
    LATIN_ORDER,
    detect_lang,
    detect_lang_full_sql,
)

# planted fixtures: 2 docs per language, natural-ish running text
FIXTURES = [
    ("ja", "これは日本語のテキストです。カタカナのコンピュータも含みます。"),
    ("ja", "東京タワーから見た景色はとてもきれいでした。"),
    ("zh-cn", "这是一段中文文本,完全由汉字组成,没有任何假名。"),
    ("zh-cn", "北京是中国的首都,历史悠久,文化丰富。"),
    ("zh-tw", "這是一段用繁體中文寫的測試文字,裡面有許多漢字。"),
    ("zh-tw", "臺北是一個很大的城市,國家的歷史也很長,大家都會說話。"),
    ("ko", "이것은 한국어로 작성된 텍스트입니다. 한글만 사용합니다."),
    ("ko", "서울은 대한민국의 수도이며 인구가 많습니다."),
    ("th", "นี่คือข้อความภาษาไทยสำหรับการทดสอบระบบ"),
    ("th", "กรุงเทพมหานครเป็นเมืองหลวงของประเทศไทย"),
    ("hi", "यह हिंदी में लिखा गया एक परीक्षण पाठ है।"),
    ("hi", "भारत एक विशाल देश है जिसकी संस्कृति समृद्ध है।"),
    ("he", "זהו טקסט בדיקה שנכתב בעברית מודרנית."),
    ("he", "ירושלים היא עיר עתיקה מאוד בהיסטוריה."),
    ("ar", "هذا نص تجريبي مكتوب باللغة العربية الفصحى."),
    ("ar", "القاهرة مدينة كبيرة جدا في مصر."),
    ("el", "αυτό είναι ένα δοκιμαστικό κείμενο στα ελληνικά."),
    ("el", "η αθήνα είναι η πρωτεύουσα της ελλάδας."),
    ("ru", "это тестовый текст написанный на русском языке без украинских букв."),
    ("ru", "москва очень большой город с длинной историей."),
    ("uk", "це тестовий текст українською мовою з літерами і ї є ґ."),
    ("uk", "київ є столицею україни і дуже гарне місто."),
    ("de", "der hund und die katze sind nicht mit dem vogel auf ein dach."),
    ("de", "das wetter ist heute schön und wir werden auch spazieren gehen."),
    ("en", "the quick brown fox jumps over the lazy dog in the garden."),
    ("en", "this is a test of the language detection system that we have."),
    ("es", "el perro y los gatos están sobre la mesa pero son muy tranquilos."),
    ("es", "las ciudades de españa son más bonitas entre primavera y verano."),
    ("fr", "le chien est dans le jardin avec les enfants qui ne jouent pas."),
    ("fr", "les villes de france sont belles pour ceux qui ont du temps."),
    ("it", "il cane è nel giardino con una palla che per lui è anche bella."),
    ("it", "le città della italia sono più belle anche nel periodo estivo."),
    ("nl", "de hond en het paard zijn niet voor een spel met de kat aan zee."),
    ("nl", "het weer wordt mooi en wij gaan ook naar het strand vandaag."),
    ("pl", "to nie jest bardzo trudny tekst ale może być przez to tylko test."),
    ("pl", "czy to jest tak że być może oraz bardzo dobrze się uczy."),
    ("pt", "os cães não estão com um gato mas são para quem foi mais rápido."),
    ("pt", "as cidades também são bonitas para quem não foi ser turista."),
    ("sv", "hunden och katten är inte på taket för det har en fågel med sig."),
    ("sv", "det är en fin dag och vi har inte varit till staden för att handla."),
    ("tr", "bu bir test metni ve daha çok kelime ile yazılmış gibi ancak değil."),
    ("tr", "istanbul çok büyük bir şehir ve sonra daha kadar güzel değil mi."),
    ("cs", "to je text který se píše jako zkouška ale není pro této chvíle."),
    ("cs", "praha je město které jsem měl rád když jsou také hezké dny."),
    ("da", "hvad sker der efter at vi også har været hvor det kunne gøres."),
    ("da", "hvis man skulle rejse uden meget bagage er det også dansk skik."),
    ("fi", "tämä on teksti joka on kirjoitettu kun myös testi oli niin hyvä."),
    ("fi", "helsinki on kaupunki jossa hän oli mutta myös sitä kuin ennen."),
    ("hu", "ez egy szöveg hogy nem csak az ami már volt mint lehet még."),
    ("hu", "budapest egy nagy város és van benne sok ház vagy híd meg tér."),
    ("id", "ini adalah teks yang ditulis dengan bahasa untuk tidak salah."),
    ("id", "jakarta adalah kota besar dari negara ini dan juga pada pulau."),
    ("no", "jeg skal reise fra byen når det ble sent eller bare litt mer."),
    ("no", "dette er norsk tekst som ble skrevet etter at jeg kom både hit."),
    ("ro", "acesta este un text care nu este scris pentru a fi mai greu dar simplu."),
    ("ro", "bucurești este un oraș mare din țara unde sunt și alte locuri după deal."),
    ("vi", "đây là một văn bản được viết cho những người không có thời gian."),
    ("vi", "hà nội là thành phố của việt nam với nhiều người và xe đã qua."),
    ("bn", "এটি বাংলা ভাষায় লেখা একটি পরীক্ষামূলক লেখা।"),
    ("bn", "ঢাকা বাংলাদেশের রাজধানী এবং বৃহত্তম শহর।"),
    ("pa", "ਇਹ ਪੰਜਾਬੀ ਵਿੱਚ ਲਿਖਿਆ ਇੱਕ ਟੈਸਟ ਹੈ।"),
    ("pa", "ਅੰਮ੍ਰਿਤਸਰ ਪੰਜਾਬ ਦਾ ਇੱਕ ਵੱਡਾ ਸ਼ਹਿਰ ਹੈ।"),
    ("gu", "આ ગુજરાતીમાં લખાયેલ એક પરીક્ષણ છે."),
    ("gu", "અમદાવાદ ગુજરાતનું સૌથી મોટું શહેર છે."),
    ("ta", "இது தமிழில் எழுதப்பட்ட சோதனை உரை ஆகும்."),
    ("ta", "சென்னை தமிழ்நாட்டின் தலைநகரம் ஆகும்."),
    ("te", "ఇది తెలుగులో రాసిన పరీక్ష వచనం."),
    ("te", "హైదరాబాద్ తెలంగాణ రాజధాని నగరం."),
    ("kn", "ಇದು ಕನ್ನಡದಲ್ಲಿ ಬರೆದ ಪರೀಕ್ಷಾ ಪಠ್ಯ."),
    ("kn", "ಬೆಂಗಳೂರು ಕರ್ನಾಟಕದ ರಾಜಧಾನಿ ನಗರ."),
    ("ml", "ഇത് മലയാളത്തിൽ എഴുതിയ പരീക്ഷണ വാചകം."),
    ("ml", "കൊച്ചി കേരളത്തിലെ വലിയ നഗരമാണ്."),
    ("si", "මෙය සිංහලෙන් ලියූ පරීක්ෂණ පාඨයකි."),
    ("si", "කොළඹ ශ්‍රී ලංකාවේ විශාලතම නගරයයි."),
    ("ka", "ეს არის ქართულად დაწერილი სატესტო ტექსტი."),
    ("ka", "თბილისი საქართველოს დედაქალაქია."),
    ("hy", "սա հայերեն գրված փորձնական տեքստ է։"),
    ("hy", "երևանը հայաստանի մայրաքաղաքն է։"),
    ("am", "ይህ በአማርኛ የተጻፈ የሙከራ ጽሑፍ ነው።"),
    ("am", "አዲስ አበባ የኢትዮጵያ ዋና ከተማ ናት።"),
    ("my", "ဒါက မြန်မာဘာသာဖြင့် ရေးထားသော စမ်းသပ်စာသား ဖြစ်သည်။"),
    ("my", "ရန်ကုန်သည် မြန်မာနိုင်ငံ၏ အကြီးဆုံးမြို့ ဖြစ်သည်။"),
    ("km", "នេះជាអត្ថបទសាកល្បងសរសេរជាភាសាខ្មែរ។"),
    ("km", "ភ្នំពេញជារាជធានីនៃប្រទេសកម្ពុជា។"),
    ("lo", "ນີ້ແມ່ນຂໍ້ຄວາມທົດສອບຂຽນເປັນພາສາລາວ."),
    ("lo", "ວຽງຈັນເປັນນະຄອນຫຼວງຂອງປະເທດລາວ."),
    ("fa", "این یک متن آزمایشی است که شامل واژه‌های گوناگون و کوچک می‌باشد."),
    ("fa", "تهران پایتخت ایران است و شهری بزرگ با چندین پل و گذرگاه است."),
    ("ur", "یہ اردو میں لکھا گیا ہے اور اس میں بڑے الفاظ ہیں۔"),
    ("ur", "کراچی پاکستان کا سب سے بڑا شہر ہے اور لوگ وہاں رہتے ہیں۔"),
    ("bg", "това е тестов текст според който може да се провери защото съм тук."),
    ("bg", "софия е столицата на българия и това е град след планината."),
    ("mk", "скопје е главниот град на македонија и луѓето таму се љубезни."),
    ("mk", "ова е текст на македонски јазик со букви ѓ и ќ и џ внатре."),
    ("mr", "हे मराठी मध्ये लिहिलेले आहे आणि ही चाचणी आहे असे यांनी सांगितले."),
    ("mr", "मुंबई मध्ये खूप लोक आहेत आणि ती मोठी नगरी आहे असे झाली नोंद."),
    ("ne", "यो नेपाली भाषा मा गरेको परीक्षण हो र यो यहाँ लेखिएको छ।"),
    ("ne", "काठमाडौं नेपालको राजधानी हो र त्यहाँ धेरै मानिस बस्ने गरेको छ।"),
    ("af", "ek wil baie graag vir hulle hierdie boek gee want iemand het dit gesê."),
    ("af", "ons sal altyd daardie plek onthou want dit het vir ons baie geword."),
    ("et", "tema tuli pärast ning võttis oma raamatu kuid luges ainult selle."),
    ("et", "tallinn on linn kus kõik saavad ka üks hetk oma aega veeta või mitte."),
    ("hr", "ovo je tekst koji se piše kako bi se nakon toga ili zbog nečega vidjelo."),
    ("hr", "zagreb je grad koji također ima duge godine povijesti i svi ga znaju."),
    ("lt", "tai yra tekstas apie tai kaip buvo jau taip ir bet kurie metų dalykai."),
    ("lt", "vilnius yra miestas kuriame ir buvo daug žmonių bei namų apie kuriuos."),
    ("lv", "viņš arī bija tas kurš pēc gada tika savu darbu šajā vietā darījis."),
    ("lv", "rīga ir pilsēta kur arī bija daudz cilvēku un tas tika zināms pēc kara."),
    ("sk", "bol to text ktorý môže byť aj veľmi dobrý alebo podľa niečoho tiež zlý."),
    ("sk", "bratislava je mesto kde boli domy ktoré sú aj staré a veľmi pekné."),
    ("sl", "to je besedilo ki ga lahko tudi kot vendar zaradi tega niso brali ter več."),
    ("sl", "ljubljana je mesto kjer bodo ljudje tudi svoje dni lahko preživeli ter več."),
    ("so", "waxaa jira qoraal oo waa mid loo sameeyay iyo in kala duwan ayaa la arkay."),
    ("so", "muqdisho waa magaalo weyn oo wuxuu qof walba iyo dad badan soo arkaan."),
    ("sq", "ky është një tekst dhe për të gjithë nga shumë vende sipas këtë vitin."),
    ("sq", "tirana është një qytet dhe shumë njerëz janë nga kjo anë sipas meje."),
    ("sw", "hii ni maandishi katika lugha kwa watu wengi lakini pia kama kuwa sana."),
    ("sw", "nairobi ni mji mkubwa kwa watu wake na pia kuna mambo sana kama hayo."),
    ("tl", "ito ang teksto na ang mga tao ay hindi siya kung naman lang babasahin."),
    ("tl", "ang maynila ay isang lungsod na mga tao ay marami at ito ay malaki."),
    ("und", "zzz qqq xxx 12345 67890"),
    ("und", ""),
]


@pytest.fixture(scope="module")
def fixture_df(spark):
    rows = [(i, lang, text) for i, (lang, text) in enumerate(FIXTURES)]
    return spark.createDataFrame(
        rows, "doc_id long, lang_true string, text string"
    )


def test_accuracy_on_planted_fixtures(spark, fixture_df):
    """Every planted doc classifies to its true language — script
    languages via block counts, Latin via stopword argmax, und when
    nothing matches."""
    got = {
        r.doc_id: r.lang_pred
        for r in fixture_df.select(
            "doc_id", detect_lang(F.col("text")).alias("lang_pred")
        ).collect()
    }
    wrong = [
        (i, FIXTURES[i][0], got[i])
        for i in range(len(FIXTURES))
        if got[i] != FIXTURES[i][0]
    ]
    assert not wrong, f"misclassified: {wrong}"


def test_coverage_all_53_reference_profiles():
    """Every language code the reference's langdetect profiles emit
    (src/main/resources/com/cybozu/labs/langdetect/profiles) is a
    possible output of detect_lang."""
    ref_53 = (
        "af ar bg bn cs da de el en es et fa fi fr gu he hi hr hu id "
        "it ja kn ko lt lv mk ml mr ne nl no pa pl pt ro ru sk sl so "
        "sq sv sw ta te th tl tr uk ur vi zh-cn zh-tw"
    ).split()
    assert len(ref_53) == 53
    missing = [lang for lang in ref_53 if lang not in ALL_LANGS]
    assert not missing, f"reference profiles not covered: {missing}"
    assert len(set(ALL_LANGS)) >= 53
    assert len(LATIN_ORDER) == 29


def test_duckdb_twin_exact_parity(spark, fixture_df):
    """detect_lang and detect_lang_full_sql agree row-for-row on the
    fixtures AND on adversarial mixed-language rows."""
    extra = [
        (100, "?", "der hund the fox le chien"),     # Latin 3-way tie
        (101, "?", "一 a 二 b"),                      # han below threshold
        (102, "?", "日本語と english mixed コンテンツ"),  # kana wins
        (103, "?", "і ї це"),                        # cyrillic below min
        (104, "?", "это текст з і ї є літерами"),     # cyrillic + uk marks
        (105, "?", "هذا نص عربي مع حرف گ واحد فقط"),   # arabic, 1 fa mark only
        (106, "?", "一二三四五六七八九十"),               # han, no orthography marker -> zh-cn default
        (107, "?", "это текст със съм дума"),            # cyrillic + 1 bg word -> bg
        (108, "?", "ये शब्द हैं और कुछ नहीं"),              # deva, no mr/ne probe -> hi
        (109, "?", "نص میں ایک ڑ"),                      # arabic + 2 ur marks -> ur
    ]
    df = fixture_df.unionByName(
        spark.createDataFrame(
            extra, "doc_id long, lang_true string, text string"
        )
    )
    got = (
        df.select("doc_id", detect_lang(F.col("text")).alias("lang_pred"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pdf = df.select("doc_id", "text").toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (
        con.sql(detect_lang_full_sql("documents", "text", "doc_id"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["lang_pred"].tolist() == want["lang_pred"].tolist()


def test_tie_breaks_alphabetical_first(spark):
    """Equal Latin scores resolve to the alphabetically first language
    (deterministic, engine-portable)."""
    df = spark.createDataFrame(
        [(1, "der the")], "doc_id long, text string"
    )  # de and en each score 1
    row = df.select(detect_lang(F.col("text")).alias("p")).collect()[0]
    assert row.p == "de"


def test_stray_foreign_chars_do_not_flip(spark):
    """A mostly-English doc with 1-2 CJK chars stays English
    (SCRIPT_MIN guard)."""
    df = spark.createDataFrame(
        [(1, "the quick brown fox of the 中 garden"),
         (2, "this is the file 漢字 with two chars 的 only")],
        "doc_id long, text string",
    )
    got = [r.p for r in df.select(detect_lang(F.col("text")).alias("p")).collect()]
    assert got == ["en", "en"]
