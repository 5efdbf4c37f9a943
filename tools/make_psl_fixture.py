#!/usr/bin/env python3
"""Regenerates fixtures/psl.csv — a committed SUBSET of the public suffix
list (publicsuffix.org, Mozilla-maintained, public domain data) in its
documented rule syntax: plain suffixes, `*.` wildcards (match exactly one
extra label), `!` exceptions. Entries below are well-known rules from the
public list, written from its published shape (zero-egress environment —
this is a curated subset, not a fetch); the goal is rule DENSITY and DEPTH
(bases up to 5 labels) so graft's depth derivation and broadcast probes are
exercised at realistic scale, not 1:1 freshness with today's list.

Invariant the oracle relies on: the synthetic corpus hosts are
{www.|cdn.|}srcN.{com|co.uk|github.io}, and no rule here has a base ending
in `srcN.<tld>`, so growing this table never changes query results — only
the probe depth (now 5) and the broadcast size (~1k rows).

Run from the repo root: python3 tools/make_psl_fixture.py
"""
import os

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "fixtures", "psl.csv")

icann = []
private = []

# --- ICANN: generic + sponsored TLDs -----------------------------------
icann += [
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "name", "pro", "aero", "asia", "cat", "coop", "jobs", "mobi",
    "museum", "post", "tel", "travel", "xxx",
    # new-gTLD program (all real delegations)
    "app", "dev", "io", "ai", "xyz", "online", "site", "store", "tech",
    "blog", "cloud", "club", "shop", "art", "wiki", "live", "news",
    "space", "website", "fun", "page", "link", "design", "top", "vip",
    "work", "world", "today", "life", "email", "solutions", "digital",
    "agency", "network", "systems", "media", "studio", "zone", "codes",
    "tools", "run", "build", "cool", "city", "team", "group", "company",
    "center", "plus", "chat", "games", "express", "finance", "capital",
    "academy", "school", "training", "foundation", "gallery",
]

# --- ICANN: ccTLDs -------------------------------------------------------
cctlds = (
    "ad ae af ag al am ao ar at az ba bb bd be bf bg bh bi bj bm bn bo "
    "br bs bt bw by bz ca cc cd cf cg ch ci cl cm cn co cr cu cv cy cz "
    "de dj dk dm do dz ec ee eg er es et eu fi fj fm fo fr ga gd ge gg "
    "gh gi gl gm gn gq gr gt gu gw gy hk hn hr ht hu id ie il im in iq "
    "ir is it je jm jo jp ke kg kh ki km kn kr kw ky kz la lb lc li lk "
    "lr ls lt lu lv ly ma mc md me mg mk ml mm mn mo mr ms mt mu mv mw "
    "mx my mz na nc ne nf ng ni nl no np nr nu nz om pa pe pf pg ph pk "
    "pl pm pn pr ps pt pw py qa re ro rs ru rw sa sb sc sd se sg sh si "
    "sk sl sm sn so sr st sv sy sz tc td tg th tj tk tl tm tn to tr tt "
    "tv tw tz ua ug uk us uy uz va vc ve vg vi vn vu wf ws ye yt za zm "
    "zw"
).split()
icann += cctlds

# --- ICANN: classic {com,net,org,edu,gov}.cc second levels --------------
# ccTLDs that really run the five-registry second-level scheme.
five_scheme = (
    "ar au bd bh bn bo br bz co cu cy do dz ec eg et fj gh gi gt gu hk "
    "jm jo kh kw ky lb lr ls mm mo mt mv mx my mz nf ng ni np om pa pe "
    "pg ph pk pl pr ps pt py qa sa sb sg sl sv sy tr tw ua uy uz ve vi "
    "vn ye"
).split()
for cc in five_scheme:
    for sld in ("com", "net", "org", "edu", "gov"):
        icann.append(f"{sld}.{cc}")

# --- ICANN: co./ac./or./ne. style second levels --------------------------
for cc in ("at bw ci cr id il in ke kr ls ma mw mz nz rw th tz ug uk za "
           "zm zw jp").split():
    icann.append(f"co.{cc}")
for cc in ("at be cn cr cy fj gn id il im in ir jp ke kr lk ma me mu mw "
           "mz ni nz pa pg rs ru rw sz th tj tz ug uk vn za zm zw").split():
    icann.append(f"ac.{cc}")
for cc in ("at bi cr id jp ke kr th tz ug").split():
    icann.append(f"or.{cc}")
for cc in ("jp kr tz ug").split():
    icann.append(f"ne.{cc}")
# UK extras beyond co/org/ac/gov/net
icann += ["me.uk", "ltd.uk", "plc.uk", "sch.uk", "nhs.uk", "police.uk",
          "gov.scot", "gov.wales", "mod.uk"]

# --- ICANN: .jp prefectures (all 47, real PSL block) ---------------------
prefs = (
    "hokkaido aomori iwate miyagi akita yamagata fukushima ibaraki "
    "tochigi gunma saitama chiba tokyo kanagawa niigata toyama ishikawa "
    "fukui yamanashi nagano gifu shizuoka aichi mie shiga kyoto osaka "
    "hyogo nara wakayama tottori shimane okayama hiroshima yamaguchi "
    "tokushima kagawa ehime kochi fukuoka saga nagasaki kumamoto oita "
    "miyazaki kagoshima okinawa"
).split()
icann += [f"{p}.jp" for p in prefs]
# designated-city wildcard/exception pairs (real PSL block)
for city in ("kawasaki kitakyushu kobe nagoya sapporo sendai "
             "yokohama").split():
    icann.append(f"*.{city}.jp")
    icann.append(f"!city.{city}.jp")

# --- ICANN: .us locality scheme (k12/cc/lib per state, real PSL block) ---
states = (
    "ak al ar az ca co ct dc de fl ga hi ia id il in ks ky la ma md me "
    "mi mn mo ms mt nc nd ne nh nj nm nv ny oh ok or pa ri sc sd tn tx "
    "ut va vt wa wi wv wy"
).split()
for st in states:
    icann.append(f"{st}.us")
    for kind in ("k12", "cc", "lib"):
        icann.append(f"{kind}.{st}.us")

# --- ICANN: wildcard TLDs (real: bn was, ck, er, fk, np use/used *.) -----
icann += ["*.ck", "!www.ck", "*.er", "*.fk", "*.np", "*.kh"]

# --- private section ------------------------------------------------------
private += [
    "github.io", "githubusercontent.com", "githubpreview.dev",
    "gitlab.io", "pages.dev", "workers.dev", "blogspot.com",
    "herokuapp.com", "herokussl.com", "netlify.app", "vercel.app",
    "firebaseapp.com", "web.app", "appspot.com", "cloudfunctions.net",
    "azurewebsites.net", "cloudapp.net", "azure-api.net", "azureedge.net",
    "azurecontainer.io", "azurestaticapps.net", "cloudfront.net",
    "fastlylb.net", "glitch.me", "onrender.com",
    "fly.dev", "deno.dev", "supabase.co", "wixsite.com", "weeblysite.com",
    "readthedocs.io", "codeberg.page", "neocities.org", "surge.sh",
    "now.sh", "oraclecloud.com", "linodeusercontent.com",
    "digitaloceanspaces.com", "b-cdn.net", "ngrok.io",
    "repl.co", "streamlit.app", "hf.space", "*.platform.sh",
    "*.platformsh.site", "*.webhare.dev", "*.hosting.myjino.ru",
    "s3.amazonaws.com", "*.compute.amazonaws.com",
    "*.compute-1.amazonaws.com", "*.elb.amazonaws.com",
    "s3-website-us-east-1.amazonaws.com",
]
# blogspot.<cc> / blogspot.com.<cc> (real PSL block, Google registrations)
for cc in ("ae al am ba be bg ca ch cl cz de dk fi fr gr hk hr hu ie in "
           "is it jp kr li lt lu md mk mr mx my nl no pe pt qa re ro rs "
           "ru se sg si sk sn td tw ug vn").split():
    private.append(f"blogspot.{cc}")
for cc in ("ar au br by co cy ee eg es mt ng tr uy").split():
    private.append(f"blogspot.com.{cc}")
# AWS regional S3 bases (real PSL block; depth-4 and depth-5 bases)
regions = (
    "us-east-1 us-east-2 us-west-1 us-west-2 eu-west-1 eu-west-2 "
    "eu-west-3 eu-central-1 eu-north-1 eu-south-1 ap-south-1 "
    "ap-northeast-1 ap-northeast-2 ap-northeast-3 ap-southeast-1 "
    "ap-southeast-2 ap-east-1 ca-central-1 sa-east-1 af-south-1 "
    "me-south-1"
).split()
for r in regions:
    private.append(f"s3.{r}.amazonaws.com")
    private.append(f"s3-website.{r}.amazonaws.com")
    private.append(f"s3.dualstack.{r}.amazonaws.com")

# ---------------------------------------------------------------------------
seen = set()
rows = []
for rule, section in [(r, "icann") for r in icann] + \
                     [(r, "private") for r in private]:
    assert rule and "," not in rule, rule
    base = rule.lstrip("!").lstrip("*.").split(".")
    assert 1 <= len(rule.lstrip("!*.").split(".")) <= 5, rule
    # the oracle-stability invariant: never a rule under srcN.*
    assert not any(lbl.startswith("src") for lbl in rule.split(".")), rule
    if rule not in seen:
        seen.add(rule)
        rows.append((rule, section))

with open(OUT, "w") as f:
    f.write("rule,section\n")
    for rule, section in rows:
        f.write(f"{rule},{section}\n")
print(f"wrote {len(rows)} rules to {OUT}")
max_depth = max(len(r.lstrip("!").replace("*.", "").split(".")) for r, _ in rows)
print(f"max base depth: {max_depth}")
