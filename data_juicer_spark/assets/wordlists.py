"""Hermetic per-language word-list assets.

The reference downloads per-language stopword / flagged-word assets at
runtime (filter/stopwords_filter.py:34-132, flagged_words_filter.py:39-144
via utils/model_utils prepare lists). This engine must be hermetic, so a
self-authored set of common function words per language ships in the
repo instead — same contract (union of per-lang lists, lowercase
membership). The lists below are written from general linguistic
knowledge (articles, pronouns, prepositions, conjunctions, auxiliaries,
common adverbs); they are still smaller than the reference's
downloadable assets — pass explicit ``stopwords=[...]`` /
``flagged_words=[...]`` for production-grade lists.
"""

STOPWORDS = {
    "en": [
        "the", "a", "an", "and", "or", "but", "if", "then", "else",
        "of", "in", "on", "at", "to", "for", "with", "by", "from",
        "as", "is", "are", "was", "were", "be", "been", "being",
        "it", "its", "this", "that", "these", "those", "he", "she",
        "they", "we", "you", "i", "me", "him", "them", "us", "not",
        "no", "nor", "do", "does", "did", "done", "doing", "have",
        "has", "had", "having", "will", "would", "shall", "can",
        "could", "should", "may", "might", "must", "my", "your",
        "his", "her", "their", "our", "mine", "yours", "hers",
        "theirs", "ours", "so", "than", "too", "very", "just",
        "about", "above", "below", "under", "over", "between",
        "through", "during", "before", "after", "again", "further",
        "once", "here", "there", "where", "when", "why", "how",
        "what", "which", "who", "whom", "whose", "all", "any",
        "both", "each", "few", "more", "most", "other", "some",
        "such", "only", "own", "same", "also", "into", "onto",
        "out", "off", "up", "down", "while", "because", "until",
        "although", "though", "unless", "since", "whether", "either",
        "neither", "am", "himself", "herself", "itself", "myself",
        "yourself", "themselves", "ourselves", "one", "ones",
        "something", "anything", "nothing", "everything", "someone",
        "anyone", "everyone", "nobody", "somewhere", "anywhere",
        "everywhere", "now", "ever", "never", "always", "often",
        "sometimes", "rarely", "usually", "already", "yet", "still",
        "even", "much", "many", "little", "less", "least", "quite",
        "rather", "almost", "enough", "indeed", "perhaps", "maybe",
        "however", "therefore", "thus", "hence", "moreover",
        "meanwhile", "instead", "otherwise", "besides", "anyway",
        "against", "among", "within", "without", "upon", "toward",
        "towards", "across", "behind", "beyond", "near", "around",
        "along", "despite", "per", "via", "versus", "except",
        # contractions — standard members of English stopword lists;
        # their presence is what reproduces the reference's own
        # test_stopwords_filter.py en_case keep/drop decisions (row 2's
        # ratio crosses min_ratio=0.3 only if "it's" counts)
        "it's", "that's", "there's", "here's", "what's", "who's",
        "let's", "don't", "doesn't", "didn't", "isn't", "aren't",
        "wasn't", "weren't", "won't", "wouldn't", "can't", "cannot",
        "couldn't", "shouldn't", "mustn't", "haven't", "hasn't",
        "hadn't", "i'm", "i've", "i'll", "i'd", "you're", "you've",
        "you'll", "you'd", "he's", "he'll", "he'd", "she's", "she'll",
        "she'd", "we're", "we've", "we'll", "we'd", "they're",
        "they've", "they'll", "they'd",
    ],
    "es": [
        "el", "la", "los", "las", "un", "una", "unos", "unas", "y",
        "e", "o", "u", "ni", "pero", "sino", "si", "de", "del", "en",
        "a", "al", "por", "para", "con", "sin", "sobre", "bajo",
        "entre", "hacia", "hasta", "desde", "durante", "contra",
        "según", "tras", "es", "son", "era", "eran", "fue", "fueron",
        "ser", "estar", "está", "están", "estaba", "estaban", "estuvo",
        "he", "ha", "han", "hay", "había", "hubo", "haber", "tener",
        "tiene", "tienen", "tenía", "que", "quien", "quienes", "cual",
        "cuales", "como", "cuando", "donde", "cuanto", "su", "sus",
        "mi", "mis", "tu", "tus", "nuestro", "nuestra", "nuestros",
        "nuestras", "vuestro", "vuestra", "se", "lo", "le", "les",
        "me", "te", "nos", "os", "yo", "tú", "él", "ella", "ellos",
        "ellas", "nosotros", "nosotras", "vosotros", "vosotras",
        "usted", "ustedes", "no", "ya", "muy", "más", "menos", "tan",
        "tanto", "también", "tampoco", "este", "esta", "estos",
        "estas", "ese", "esa", "esos", "esas", "aquel", "aquella",
        "aquellos", "aquellas", "esto", "eso", "aquello", "todo",
        "toda", "todos", "todas", "otro", "otra", "otros", "otras",
        "mismo", "misma", "cada", "algún", "alguna", "algunos",
        "algunas", "ningún", "ninguna", "algo", "nada", "alguien",
        "nadie", "aquí", "ahí", "allí", "ahora", "antes", "después",
        "luego", "siempre", "nunca", "aún", "todavía", "entonces",
        "pues", "porque", "aunque", "mientras", "además", "así",
    ],
    "fr": [
        "le", "la", "les", "un", "une", "des", "du", "de", "d", "l",
        "et", "ou", "ni", "mais", "or", "donc", "car", "si", "dans",
        "sur", "sous", "avec", "sans", "pour", "par", "entre", "vers",
        "chez", "depuis", "pendant", "avant", "après", "contre",
        "malgré", "selon", "est", "sont", "était", "étaient", "fut",
        "être", "été", "avoir", "a", "ont", "avait", "avaient", "eu",
        "sera", "seront", "serait", "que", "qui", "quoi", "dont",
        "lequel", "laquelle", "lesquels", "lesquelles", "comme",
        "quand", "comment", "pourquoi", "où", "son", "sa", "ses",
        "mon", "ma", "mes", "ton", "ta", "tes", "notre", "nos",
        "votre", "vos", "leur", "leurs", "se", "ce", "cet", "cette",
        "ces", "cela", "ceci", "ça", "il", "elle", "ils", "elles",
        "nous", "vous", "je", "j", "tu", "on", "me", "te", "lui",
        "eux", "moi", "toi", "soi", "y", "en", "ne", "pas", "plus",
        "moins", "très", "trop", "aussi", "ainsi", "alors", "donc",
        "encore", "déjà", "toujours", "jamais", "souvent", "parfois",
        "ici", "là", "tout", "toute", "tous", "toutes", "autre",
        "autres", "même", "mêmes", "chaque", "quelque", "quelques",
        "aucun", "aucune", "rien", "personne", "quelqu", "plusieurs",
        "certains", "certaines", "parce", "puisque", "lorsque",
        "tandis", "cependant", "pourtant", "néanmoins", "enfin",
        "ensuite", "puis", "bien", "peu", "beaucoup", "assez",
    ],
    "de": [
        "der", "die", "das", "den", "dem", "des", "ein", "eine",
        "einen", "einem", "einer", "eines", "und", "oder", "aber",
        "sondern", "denn", "doch", "wenn", "dann", "als", "wie",
        "von", "in", "im", "an", "am", "auf", "mit", "ohne", "für",
        "durch", "gegen", "bei", "beim", "nach", "vor", "über",
        "unter", "zwischen", "aus", "zu", "zum", "zur", "seit",
        "während", "wegen", "trotz", "ist", "sind", "war", "waren",
        "sein", "gewesen", "wird", "werden", "wurde", "wurden",
        "haben", "hat", "hatte", "hatten", "habe", "kann", "können",
        "konnte", "muss", "müssen", "musste", "soll", "sollen",
        "sollte", "will", "wollen", "wollte", "darf", "dürfen",
        "mag", "möchte", "dass", "ob", "weil", "da", "damit",
        "obwohl", "während", "bevor", "nachdem", "sein", "seine",
        "seiner", "seinem", "seinen", "ihr", "ihre", "ihrer",
        "ihrem", "ihren", "mein", "meine", "meiner", "meinem",
        "meinen", "dein", "deine", "unser", "unsere", "euer", "eure",
        "sich", "es", "er", "sie", "wir", "du", "ich", "ihr", "ihm",
        "ihn", "uns", "euch", "mir", "mich", "dir", "dich", "man",
        "nicht", "kein", "keine", "keinen", "keinem", "keiner",
        "schon", "sehr", "auch", "nur", "noch", "wo", "wann",
        "warum", "wer", "wen", "wem", "wessen", "was", "welche",
        "welcher", "welches", "alle", "allem", "allen", "aller",
        "alles", "andere", "anderen", "anderer", "jede", "jeder",
        "jedes", "jedem", "jeden", "einige", "manche", "solche",
        "hier", "dort", "dorthin", "immer", "nie", "niemals", "oft",
        "wieder", "bereits", "etwa", "etwas", "nichts", "jemand",
        "niemand", "so", "also", "dennoch", "jedoch", "deshalb",
        "daher", "darum", "dabei", "dazu", "davon", "darauf",
    ],
    "it": [
        "il", "lo", "la", "i", "gli", "le", "un", "uno", "una", "e",
        "ed", "o", "od", "ma", "però", "anche", "se", "di", "del",
        "dello", "della", "dei", "degli", "delle", "in", "nel",
        "nello", "nella", "nei", "negli", "nelle", "a", "al", "allo",
        "alla", "ai", "agli", "alle", "da", "dal", "dallo", "dalla",
        "dai", "dagli", "dalle", "su", "sul", "sullo", "sulla",
        "sui", "sugli", "sulle", "per", "con", "senza", "tra", "fra",
        "è", "sono", "era", "erano", "fu", "furono", "essere",
        "stato", "stata", "avere", "ha", "hanno", "aveva", "avevano",
        "ho", "hai", "abbiamo", "che", "chi", "cui", "quale", "quali",
        "come", "quando", "dove", "perché", "suo", "sua", "suoi",
        "sue", "mio", "mia", "miei", "mie", "tuo", "tua", "tuoi",
        "tue", "nostro", "nostra", "nostri", "nostre", "vostro",
        "vostra", "loro", "si", "ci", "vi", "mi", "ti", "lo", "li",
        "ne", "io", "tu", "lui", "lei", "noi", "voi", "essi", "esse",
        "non", "no", "già", "più", "meno", "molto", "poco", "tanto",
        "troppo", "questo", "questa", "questi", "queste", "quello",
        "quella", "quelli", "quelle", "tutto", "tutta", "tutti",
        "tutte", "altro", "altra", "altri", "altre", "ogni", "alcuni",
        "alcune", "nessuno", "nessuna", "qualche", "qualcosa",
        "niente", "nulla", "qui", "qua", "lì", "là", "ora", "adesso",
        "prima", "dopo", "poi", "sempre", "mai", "ancora", "allora",
        "quindi", "dunque", "inoltre", "invece", "mentre", "bene",
    ],
    "pt": [
        "o", "a", "os", "as", "um", "uma", "uns", "umas", "e", "ou",
        "nem", "mas", "porém", "se", "de", "do", "da", "dos", "das",
        "em", "no", "na", "nos", "nas", "num", "numa", "por", "pelo",
        "pela", "pelos", "pelas", "para", "com", "sem", "sobre",
        "sob", "entre", "até", "desde", "durante", "contra", "após",
        "é", "são", "era", "eram", "foi", "foram", "ser", "sido",
        "estar", "está", "estão", "estava", "estavam", "esteve",
        "ter", "tem", "têm", "tinha", "tinham", "teve", "há", "havia",
        "que", "quem", "qual", "quais", "como", "quando", "onde",
        "quanto", "seu", "seus", "sua", "suas", "meu", "meus",
        "minha", "minhas", "teu", "teus", "tua", "tuas", "nosso",
        "nossa", "nossos", "nossas", "vosso", "vossa", "se", "lhe",
        "lhes", "me", "te", "nos", "vos", "eu", "tu", "ele", "ela",
        "eles", "elas", "nós", "vós", "você", "vocês", "não", "já",
        "muito", "mais", "menos", "tão", "tanto", "também", "este",
        "esta", "estes", "estas", "esse", "essa", "esses", "essas",
        "aquele", "aquela", "aqueles", "aquelas", "isto", "isso",
        "aquilo", "todo", "toda", "todos", "todas", "outro", "outra",
        "outros", "outras", "mesmo", "mesma", "cada", "algum",
        "alguma", "alguns", "algumas", "nenhum", "nenhuma", "algo",
        "nada", "alguém", "ninguém", "aqui", "ali", "lá", "agora",
        "antes", "depois", "então", "sempre", "nunca", "ainda",
        "porque", "embora", "enquanto", "além", "assim", "pois",
    ],
    "nl": [
        "de", "het", "een", "en", "of", "maar", "want", "dus", "als",
        "dan", "van", "in", "op", "aan", "met", "zonder", "voor",
        "door", "bij", "naar", "uit", "over", "onder", "tussen",
        "tegen", "sinds", "tijdens", "is", "zijn", "was", "waren",
        "geweest", "wordt", "worden", "werd", "werden", "hebben",
        "heeft", "had", "hadden", "heb", "kan", "kunnen", "kon",
        "moet", "moeten", "moest", "zal", "zullen", "zou", "zouden",
        "wil", "willen", "wilde", "mag", "mogen", "dat", "die", "dit",
        "deze", "wat", "wie", "welke", "hoe", "waar", "wanneer",
        "waarom", "zijn", "haar", "hun", "mijn", "jouw", "uw", "ons",
        "onze", "jullie", "zich", "het", "hij", "zij", "ze", "wij",
        "we", "jij", "je", "ik", "mij", "me", "hem", "hen", "u",
        "niet", "geen", "al", "nog", "ook", "alleen", "zeer", "erg",
        "te", "toch", "wel", "hier", "daar", "nu", "toen", "altijd",
        "nooit", "vaak", "soms", "alle", "allemaal", "elke", "ieder",
        "iedere", "sommige", "andere", "ander", "iets", "niets",
        "iemand", "niemand", "alles", "omdat", "hoewel", "terwijl",
        "daarom", "daardoor", "bovendien", "echter", "toen",
    ],
    "ru": [
        "и", "в", "во", "не", "на", "я", "он", "она", "оно", "они",
        "мы", "вы", "ты", "что", "чтобы", "как", "а", "но", "или",
        "либо", "да", "нет", "ни", "же", "бы", "ли", "из", "у", "к",
        "ко", "с", "со", "по", "за", "от", "до", "о", "об", "обо",
        "при", "над", "под", "без", "для", "про", "через", "между",
        "это", "этот", "эта", "эти", "тот", "та", "те", "то", "так",
        "там", "тут", "здесь", "где", "когда", "куда", "откуда",
        "почему", "зачем", "есть", "был", "была", "были", "было",
        "быть", "будет", "будут", "его", "её", "их", "мой", "моя",
        "мои", "твой", "наш", "ваш", "свой", "себя", "себе", "мне",
        "меня", "тебя", "нас", "вас", "им", "ей", "ему", "них",
        "всё", "все", "весь", "вся", "всех", "кто", "чем", "чём",
        "уже", "ещё", "очень", "только", "даже", "тоже", "также",
        "потом", "теперь", "всегда", "никогда", "может", "можно",
        "нужно", "надо", "если", "хотя", "пока", "после", "перед",
    ],
    "zh": [
        "的", "了", "和", "是", "在", "我", "有", "他", "这", "中",
        "大", "来", "上", "国", "个", "到", "说", "们", "为", "子",
        "你", "地", "出", "道", "也", "时", "年", "得", "就", "那",
        "要", "下", "以", "生", "会", "自", "着", "去", "之", "过",
        "家", "学", "对", "可", "她", "里", "后", "小", "么", "心",
        "多", "天", "而", "能", "好", "都", "然", "没", "日", "于",
        "起", "还", "发", "成", "事", "只", "作", "当", "想", "看",
        "文", "无", "开", "手", "十", "用", "主", "行", "方", "又",
        "如", "前", "所", "本", "见", "经", "头", "面", "公", "同",
        "被", "与", "很", "把", "让", "从", "给", "但", "因", "此",
    ],
    "ja": [
        "の", "に", "は", "を", "た", "が", "で", "て", "と", "し",
        "れ", "さ", "ある", "いる", "も", "する", "から", "な", "こと",
        "として", "い", "や", "れる", "など", "なっ", "ない", "この",
        "ため", "その", "あっ", "よう", "また", "もの", "という",
        "あり", "まで", "られ", "なる", "へ", "か", "だ", "これ",
        "によって", "により", "おり", "より", "による", "ず", "なり",
        "られる", "において", "ば", "なかっ", "なく", "しかし",
        "について", "せ", "だっ", "その後", "できる", "それ", "う",
        "ので", "なお", "のみ", "でき", "き", "つ", "における",
        "および", "いう", "さらに", "でも", "ら", "たり", "そして",
    ],
}

# Per-language flagged-word lists for the flagged_words_filter
# (reference: filter/flagged_words_filter.py:39-144, which downloads
# the public LDNOOBW-style per-language lists). These in-repo lists are
# self-authored from the same public-knowledge vocabulary class
# (profanity / adult-content / moderation terms) — compact versus the
# reference's full downloads, but large enough (50+ words for en/es/fr)
# to be a functioning filter; real deployments can still pass explicit
# lists or extend via the `flagged_words` override.
FLAGGED_WORDS = {
    "en": [
        "anal", "anus", "arse", "arsehole", "ass", "asshole", "bastard",
        "bdsm", "bestiality", "bitch", "blowjob", "bollocks", "boner",
        "boob", "boobs", "bukkake", "bullshit", "butthole", "clit",
        "clitoris", "cock", "condom", "creampie", "cum", "cumshot",
        "cunt", "deepthroat", "dick", "dildo", "dogging", "dyke",
        "ejaculate", "ejaculation", "erection", "erotic", "fag",
        "faggot", "felch", "fellatio", "fisting", "fuck", "fucker",
        "fucking", "gangbang", "genital", "genitals", "handjob",
        "hardcore", "hentai", "horny", "incest", "jerkoff", "jizz",
        "labia", "masturbate", "masturbation", "milf", "motherfucker",
        "nigger", "nipple", "nipples", "nude", "nudes", "orgasm",
        "orgy", "paedophile", "panties", "pedophile", "penis", "piss",
        "porn", "porno", "pornography", "prick", "prostitute", "pussy",
        "rape", "rapist", "rectum", "rimjob", "scrotum", "semen", "sex",
        "shemale", "shit", "slut", "smut", "sodomy", "spunk", "strapon",
        "threesome", "tits", "titties", "twat", "vagina", "viagra",
        "vibrator", "wank", "whore", "xxx",
    ],
    "es": [
        "anal", "ano", "bastardo", "bragas", "cabron", "cabrón",
        "chocho", "chupada", "clitoris", "clítoris", "concha", "consolador",
        "coño", "coger", "cojones", "corrida", "culo", "desnuda",
        "desnudo", "erección", "erotico", "erótico", "escroto",
        "eyacular", "follar", "folleteo", "gilipollas", "hijueputa",
        "incesto", "joder", "lamer", "lesbiana", "maricon", "maricón",
        "masturbación", "masturbarse", "mierda", "nalgas", "orgasmo",
        "orgía", "pajero", "pechos", "pene", "pezón", "pija", "polla",
        "porno", "pornografía", "prostituta", "puta", "puto", "semen",
        "sexo", "tetas", "travesti", "vagina", "verga", "violación",
        "violador", "zorra",
    ],
    "fr": [
        "anal", "anus", "baiser", "bander", "bite", "bordel", "branler",
        "branlette", "chatte", "chier", "clitoris", "con", "connard",
        "connasse", "couilles", "cul", "éjaculation", "éjaculer",
        "encule", "enculé", "enculer", "érection", "érotique", "fellation",
        "fesses", "foutre", "godemiché", "gouine", "inceste", "jouir",
        "lécher", "lesbienne", "levrette", "masturbation", "masturber",
        "merde", "nichons", "nibards", "nique", "niquer", "nu", "nue",
        "orgasme", "orgie", "partouze", "pédé", "pénis", "pipe", "porno",
        "pornographie", "prostituée", "putain", "pute", "salope", "seins",
        "sexe", "sodomie", "sperme", "suceuse", "téton", "vagin",
        "viol", "violeur", "zizi",
    ],
    "de": [
        "anal", "arsch", "arschloch", "bordell", "bumsen",
        "dildo", "ejakulation", "erektion", "erotik", "ficken", "fotze",
        "hoden", "hure", "hurensohn", "inzest", "kondom", "notgeil",
        "masturbieren", "möpse", "muschi", "nackt", "nippel", "nutte",
        "onanieren", "orgasmus", "orgie", "penis", "pimmel", "porno",
        "pornografie", "prostituierte", "scheiße", "schlampe", "schwanz",
        "schwuchtel", "sexfilm", "sperma", "titten", "vagina",
        "vergewaltigung", "vibrator", "vögeln", "wichsen", "wichser",
        "verboten", "anstößig", "obszön", "vulgär", "unflätig",
    ],
    "it": [
        "anale", "ano", "bordello", "cazzo", "coglione", "culo",
        "eiaculazione", "erezione", "erotico", "fica", "figa", "fottere",
        "incesto", "masturbarsi", "masturbazione", "merda", "minchia",
        "nuda", "nudo", "orgasmo", "orgia", "pene", "pompino", "porca",
        "porno", "pornografia", "prostituta", "puttana", "scopare",
        "sega", "sesso", "sperma", "stronzo", "stupro", "tette",
        "troia", "vaffanculo", "vagina", "vibratore", "zoccola",
        "vietato", "offensivo", "osceno", "volgare",
    ],
    "pt": [
        "anal", "ânus", "boceta", "boquete", "buceta", "caralho",
        "chupada", "cu", "ejaculação", "ereção", "erótico", "estupro",
        "foder", "gozar", "incesto", "masturbação", "merda", "nua",
        "nudez", "orgasmo", "orgia", "pau", "peitos", "pênis", "pica",
        "piroca", "porno", "pornô", "pornografia", "prostituta", "puta",
        "punheta", "sexo", "siririca", "tesão", "transar", "vadia",
        "vagina", "xereca", "xoxota",
        "proibido", "ofensivo", "obsceno", "vulgar",
    ],
    "nl": [
        "anaal", "anus", "beffen", "bordeel", "dildo", "ejaculatie",
        "erectie", "erotiek", "hoer", "hoerenzoon", "incest",
        "kut", "lul", "masturberen", "naakt", "neuken", "orgasme",
        "penis", "pijpen", "poep", "porno", "pornografie", "prostituee",
        "pornofilm", "reet", "slet", "sperma", "tepel", "tieten",
        "vagina", "verkrachting",
        "verboden", "aanstootgevend", "obsceen", "vulgair",
    ],
    "ru": [
        "анал", "блядь", "бордель", "вагина", "голая", "голый",
        "дрочить", "ебать", "елда", "изнасилование", "инцест", "конча",
        "мастурбация", "манда", "минет", "мудак", "оргазм", "оргия",
        "пенис", "пизда", "порно", "порнография", "проститутка",
        "секс", "сиськи", "сперма", "сука", "трахать", "хер", "хуй",
        "шалава", "шлюха", "эрекция",
        "запрещено", "оскорбительно", "непристойно", "вульгарно",
    ],
    "zh": [
        "色情", "淫秽", "淫荡", "裸体", "裸照", "强奸", "轮奸", "妓女",
        "嫖娼", "卖淫", "自慰", "手淫", "阴茎", "阴道", "阴部", "乳房",
        "乳头", "性交", "性爱", "做爱", "口交", "肛交", "乱伦", "春药",
        "操你", "操你妈", "他妈的", "婊子", "贱人", "骚货", "鸡巴",
        "射精", "勃起", "高潮", "援交",
        "敏感词", "违禁词", "低俗", "辱骂",
    ],
    "ja": [
        "ポルノ", "わいせつ", "猥褻", "裸体", "全裸", "強姦", "レイプ",
        "売春", "買春", "援助交際", "オナニー", "自慰", "陰茎", "陰部",
        "膣", "乳房", "乳首", "性交", "性行為", "セックス", "フェラチオ",
        "アナル", "近親相姦", "射精", "勃起", "絶頂", "エロ", "変態",
        "痴漢", "風俗",
        "禁止語", "不適切", "卑猥", "侮辱",
    ],
}


def words_for(table: dict, lang) -> list:
    """Union of per-language lists; lang may be a str, list, or None
    (None = all languages), mirroring the reference's lang handling."""
    if lang is None:
        langs = list(table)
    elif isinstance(lang, str):
        langs = [lang]
    else:
        langs = list(lang)
    out, seen = [], set()
    for lg in langs:
        for w in table.get(lg, ()):
            if w not in seen:
                seen.add(w)
                out.append(w)
    return out


def load_words_dir(words_dir: str, words_type: str, fallback: dict) -> dict:
    """Reference load_words_asset parity minus the download
    (utils/asset_utils.py:19-41): merge every `*.json` file in
    `words_dir` whose NAME contains `words_type` ({lang: [words]}
    dicts, per-lang lists concatenated across files). When the dir
    yields nothing, the reference DOWNLOADS the standard lists into it
    (utils/asset_utils.py:19-41 — its published config_all.yaml ships
    words_dir='./assets', a dir that need not pre-exist); this hermetic
    engine uses the in-repo `fallback` table as the downloaded-content
    analogue, but LOUDLY: an explicitly supplied dir that contributes
    no words emits a UserWarning naming the dir and the substitution,
    so a typo'd path cannot silently change keep/drop decisions."""
    import json
    import os
    import warnings

    out: dict = {}
    if words_dir and os.path.isdir(words_dir):
        for filename in sorted(os.listdir(words_dir)):
            if filename.endswith(".json") and words_type in filename:
                with open(os.path.join(words_dir, filename)) as fh:
                    loaded = json.load(fh)
                for key, vals in loaded.items():
                    out.setdefault(key, []).extend(vals)
    if words_dir and not out:
        warnings.warn(
            f"words_dir={words_dir!r} contains no '*.json' file whose "
            f"name contains {words_type!r}; using the built-in "
            f"{words_type} table instead (the reference would download "
            f"the standard lists into that dir at this point — check "
            f"the path/filename if you meant to supply custom lists)",
            UserWarning,
            stacklevel=2,
        )
    return out or fallback
