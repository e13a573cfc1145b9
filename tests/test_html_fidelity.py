"""Field-level fidelity for the HTML job-card parser, one test per
selector-fallback branch of the reference extractor
(/root/reference/src/crawler/parser.py:192-377). Each fixture is a
minimal malformed-or-variant card exercising exactly one branch, with a
literal expected value.

Pinned deviations from bs4 (documented in sources/html.py):
- deadline keeps only the day count (the reference stores raw text and
  regex-extracts the number later);
- tag boundaries insert a space before text normalization (bs4's
  get_text(strip=True) concatenates without separators) — strictly more
  readable output, same information.

parse_job_cards is pure Python — no SparkSession needed here.
"""

from __future__ import annotations

import datetime as dt

from jobinsight_data_pipeline_spark.sources.html import parse_job_cards

AS_OF = dt.datetime(2025, 7, 1, 8, 0, 0)


def card(inner: str, attrs: str = 'data-job-id="77"') -> str:
    return f'<div class="job-item-2" {attrs}>{inner}</div>'


def one(html: str) -> dict:
    jobs = parse_job_cards(html, AS_OF)
    assert len(jobs) == 1, f"expected 1 card, got {len(jobs)}"
    return jobs[0]


# --- job_id (parser.py:220-233) -------------------------------------------

def test_job_id_from_data_attr():
    assert one(card("<h3 class='x'></h3><h3 class=\"title\">Dev</h3>"))["job_id"] == "77"


def test_job_id_fallback_from_href_sets_job_url():
    html = card(
        '<a href="/viec-lam/ky-su-12345.html?s=1"></a><h3 class="title">Dev</h3>',
        attrs="",
    )
    j = one(html)
    assert j["job_id"] == "12345"
    assert j["job_url"] == "https://www.topcv.vn/viec-lam/ky-su-12345.html?s=1"


def test_card_without_job_id_dropped():
    assert parse_job_cards(card('<h3 class="title">Dev</h3>', attrs=""), AS_OF) == []


# --- title (parser.py:236-243) --------------------------------------------

def test_title_from_span_tooltip():
    html = card(
        '<h3 class="title"><a href="/j-1.html">'
        '<span data-original-title=" Senior Dev ">Sen…</span></a></h3>'
    )
    assert one(html)["title"] == "Senior Dev"


def test_title_fallback_text():
    assert one(card('<h3 class="title"><a>Plain Title</a></h3>'))["title"] == "Plain Title"


def test_card_without_title_dropped():
    # parser.py:168 — job_id AND title required
    assert parse_job_cards(card("<p>no title here</p>"), AS_OF) == []


# --- job_url override (parser.py:246-249) ---------------------------------

def test_job_url_from_title_anchor_overrides():
    html = card(
        '<a href="/other-999.html"></a>'
        '<h3 class="title"><a href="/real-1.html">Dev</a></h3>',
        attrs="",
    )
    j = one(html)
    assert j["job_id"] == "999"  # first-href fallback
    assert j["job_url"] == "https://www.topcv.vn/real-1.html"  # then overridden


def test_absolute_href_not_prefixed():
    html = card('<h3 class="title"><a href="https://x.vn/a-1.html">Dev</a></h3>')
    assert one(html)["job_url"] == "https://x.vn/a-1.html"


# --- company (parser.py:252-257) ------------------------------------------

def test_company_name_and_url():
    html = card(
        '<h3 class="title">Dev</h3>'
        '<a class="company" href="/cty/abc">Công ty ABC</a>'
    )
    j = one(html)
    assert j["company_name"] == "Công ty ABC"
    assert j["company_url"] == "https://www.topcv.vn/cty/abc"


# --- location (parser.py:259-287) -----------------------------------------

def test_location_tooltip_with_html_becomes_detail():
    # the tooltip-holds-HTML case the reference parses with a nested soup
    html = card(
        '<h3 class="title">Dev</h3>'
        '<label class="address" data-original-title="Hà Nội: Cầu Giấy<br>HCM: Q1">'
        "Hà Nội và 1 nơi khác</label>"
    )
    j = one(html)
    assert j["location"] == "Hà Nội và 1 nơi khác"
    assert j["location_detail"] == "Hà Nội: Cầu Giấy HCM: Q1"


def test_location_without_tooltip_detail_equals_location():
    html = card('<h3 class="title">Dev</h3><label class="address">Đà Nẵng</label>')
    j = one(html)
    assert j["location"] == "Đà Nẵng"
    assert j["location_detail"] == "Đà Nẵng"


def test_location_fallback_info_span():
    html = card(
        '<h3 class="title">Dev</h3>'
        '<div class="info"><span>Hải Phòng</span></div>'
    )
    j = one(html)
    assert j["location"] == "Hải Phòng"
    assert j["location_detail"] == "Hải Phòng"


# --- salary (parser.py:289-297) -------------------------------------------

def test_salary_label_title_salary():
    html = card(
        '<h3 class="title">Dev</h3><label class="title-salary">10 - 15 triệu</label>'
    )
    assert one(html)["salary"] == "10 - 15 triệu"


def test_salary_fallback_div():
    html = card('<h3 class="title">Dev</h3><div class="salary">Thoả thuận</div>')
    assert one(html)["salary"] == "Thoả thuận"


def test_salary_class_token_not_substring():
    # class="title-salary" must NOT satisfy a find for class 'title'
    # (bs4 class_ token semantics) — the h3 search still needs its own tag
    html = card(
        '<h3 class="title">Dev</h3><label class="title-salary">x</label>'
    )
    assert one(html)["title"] == "Dev"


# --- skills (parser.py:299-324) -------------------------------------------

def test_skills_labels_with_plus_tooltip_expansion():
    html = card(
        '<h3 class="title">Dev</h3><div class="skills">'
        '<label class="item">Java</label>'
        '<label class="item" data-original-title="SQL, Docker ">+2 +</label>'
        "</div>"
    )
    assert one(html)["skills"] == ["Java", "SQL", "Docker"]


def test_skills_plus_tooltip_starting_with_html_ignored():
    # parser.py:312 — tooltips that are HTML ('<'-prefixed) are not skills
    html = card(
        '<h3 class="title">Dev</h3><div class="skills">'
        '<label class="item" data-original-title="<b>x</b>">+3 +</label>'
        "</div>"
    )
    assert one(html)["skills"] == ["+3 +"]


def test_skills_fallback_tag_item_spans():
    html = card(
        '<h3 class="title">Dev</h3>'
        '<span class="tag-item">PHP</span><span class="tag-item">Laravel</span>'
    )
    assert one(html)["skills"] == ["PHP", "Laravel"]


# --- deadline (parser.py:326-334) -----------------------------------------

def test_deadline_label_time_strong_normalized_to_days():
    html = card(
        '<h3 class="title">Dev</h3>'
        '<label class="time"><strong>12</strong> ngày để ứng tuyển</label>'
    )
    assert one(html)["deadline"] == "12"


def test_deadline_fallback_div():
    html = card(
        '<h3 class="title">Dev</h3><div class="deadline">Còn 5 ngày</div>'
    )
    assert one(html)["deadline"] == "5"


# --- verified employer (parser.py:336-339) --------------------------------

def test_verified_badge_presence():
    with_badge = card('<h3 class="title">Dev</h3><span class="vip-badge"></span>')
    without = card('<h3 class="title">Dev</h3>')
    assert one(with_badge)["verified_employer"] is True
    assert one(without)["verified_employer"] is False


# --- last_update (parser.py:341-358) --------------------------------------

def test_last_update_label_deadline_first():
    html = card(
        '<h3 class="title">Dev</h3>'
        '<label class="deadline">Cập nhật 2 giờ trước</label>'
        '<span class="time">ignored</span>'
    )
    assert one(html)["last_update"] == "Cập nhật 2 giờ trước"


def test_last_update_span_time_second():
    html = card('<h3 class="title">Dev</h3><span class="time">3 ngày trước</span>')
    assert one(html)["last_update"] == "3 ngày trước"


def test_last_update_label_content_requires_cap_nhat():
    html = card(
        '<h3 class="title">Dev</h3>'
        '<div class="label-content">Lương cao</div>'
        '<div class="label-content">Cập nhật 1 tuần trước</div>'
    )
    assert one(html)["last_update"] == "Cập nhật 1 tuần trước"


# --- logo (parser.py:360-368) ---------------------------------------------

def test_logo_first_anchor_img():
    html = card(
        '<h3 class="title">Dev</h3>'
        '<a href="/x"><img src="https://cdn/logo.png"/></a>'
    )
    assert one(html)["logo_url"] == "https://cdn/logo.png"


def test_logo_fallback_img_responsive():
    html = card(
        '<h3 class="title">Dev</h3><img class="img-responsive" src="/l.png">'
    )
    assert one(html)["logo_url"] == "/l.png"


# --- quote-aware tag parsing (the '>'-in-attribute regression) ------------

def test_gt_inside_card_attribute_does_not_drop_card():
    # data-original-title holding HTML appears BEFORE data-job-id: a
    # naive [^>]* opening-tag match truncates at the '>' inside the
    # quoted value and loses the id
    html = (
        '<div class="job-item-2" data-original-title="a<br>b" data-job-id="55">'
        '<h3 class="title">Dev</h3></div>'
    )
    j = one(html)
    assert j["job_id"] == "55"
    assert j["title"] == "Dev"


def test_gt_inside_nested_label_attribute():
    html = card(
        '<h3 class="title">Dev</h3>'
        '<label class="address" data-original-title="X<br>Y">HN</label>'
        '<label class="title-salary">9 triệu</label>'
    )
    j = one(html)
    assert j["location_detail"] == "X Y"
    assert j["salary"] == "9 triệu"  # tags after the tooltip still parse


# --- multi-card + field hygiene -------------------------------------------

def test_two_cards_split_and_semicolon_hygiene():
    html = (
        card('<h3 class="title">A; B</h3>', attrs='data-job-id="1"')
        + card('<h3 class="title">C</h3>', attrs='data-job-id="2"')
    )
    jobs = parse_job_cards(html, AS_OF)
    assert [j["job_id"] for j in jobs] == ["1", "2"]
    # _validate_job_data hygiene: ';' → ',' (parser.py:379-389)
    assert jobs[0]["title"] == "A, B"


# --- malformed attribute forms bs4's html.parser accepts -------------------
# (the reference parses with BeautifulSoup, which tolerates all three
# quote styles; real crawled pages mix them)

def test_single_quoted_attributes():
    j = one(
        "<div class='job-item-2' data-job-id='88'>"
        "<h3 class='title'><a href='/x-9.html'><span "
        "data-original-title='Kỹ sư'>K</span></a></h3></div>"
    )
    assert j["job_id"] == "88"
    assert j["title"] == "Kỹ sư"
    assert j["job_url"] == "https://www.topcv.vn/x-9.html"


def test_unquoted_attributes():
    j = one(card("<h3 class=title>Dev</h3>", attrs="data-job-id=99"))
    assert j["job_id"] == "99"
    assert j["title"] == "Dev"


def test_mixed_quote_styles_with_gt_in_single_quoted_tooltip():
    # '>' inside a SINGLE-quoted tooltip must not truncate the attr list
    html = (
        "<div class='job-item-2' data-original-title='a<br>b' "
        'data-job-id="61"><h3 class="title">Dev</h3>'
        "<label class='address' data-original-title='HN<br>HCM'>HN</label>"
        "</div>"
    )
    j = one(html)
    assert j["job_id"] == "61"
    assert j["location_detail"] == "HN HCM"


def test_unquoted_img_src_and_single_quoted_skills_tooltip():
    html = card(
        '<h3 class="title">Dev</h3>'
        "<div class='skills'><label class='item' "
        "data-original-title='SQL, Docker'>+2 +</label></div>"
        "<a href='/y'><img src=https://cdn/l.png></a>"
    )
    j = one(html)
    assert j["skills"] == ["SQL", "Docker"]
    assert j["logo_url"] == "https://cdn/l.png"


# --- tree-structural parity (sources/htmltree.py) --------------------------
# Cases a flat regex scan cannot honor but BeautifulSoup('html.parser') —
# the reference's backend — does: nested same-name tags, comments,
# entity references, unclosed/stray tags, and true element scoping.

def test_nested_div_inside_info_does_not_truncate():
    # div.info contains a nested div BEFORE the span — naive first-</div>
    # matching would cut the span off
    html = card(
        '<h3 class="title">Dev</h3>'
        '<div class="info"><div class="icon"></div><span>Huế</span></div>'
    )
    j = one(html)
    assert j["location"] == "Huế"


def test_commented_out_card_ignored():
    html = (
        '<!-- <div class="job-item-2" data-job-id="1"><h3 class="title">X</h3></div> -->'
        + card('<h3 class="title">Real</h3>', attrs='data-job-id="2"')
    )
    jobs = parse_job_cards(html, AS_OF)
    assert [j["job_id"] for j in jobs] == ["2"]
    assert jobs[0]["title"] == "Real"


def test_entity_references_decoded():
    # bs4 html.parser decodes charrefs; '&amp;' must not survive literally
    html = card(
        '<h3 class="title">C&amp;B Executive</h3>'
        '<a class="company" href="/c">D&#x2019;Arcy &amp; Sons</a>'
    )
    j = one(html)
    assert j["title"] == "C&B Executive"
    assert j["company_name"] == "D’Arcy & Sons"


def test_unclosed_label_still_scopes_following_sibling():
    # label.address never closed — auto-closes at the card boundary;
    # the salary label nested inside it must still be found
    html = card(
        '<h3 class="title">Dev</h3>'
        '<label class="address">HN'
        '<label class="title-salary">7 triệu</label>'
    )
    j = one(html)
    assert j["salary"] == "7 triệu"
    assert j["location"] is not None and j["location"].startswith("HN")


def test_stray_end_tags_ignored():
    html = card(
        "</span></div2></label>"
        '<h3 class="title">Dev</h3></strong>'
        '<div class="salary">8 triệu</div>'
    )
    j = one(html)
    assert j["title"] == "Dev"
    assert j["salary"] == "8 triệu"


def test_fields_after_card_close_do_not_leak_in():
    # bs4 scopes extract_job_data to the job_item ELEMENT — a salary
    # sitting after </div> belongs to no card
    html = (
        card('<h3 class="title">Dev</h3>')
        + '<div class="salary">outside</div>'
    )
    assert one(html)["salary"] is None


def test_title_span_requires_anchor_ancestor():
    # reference selector is 'h3.title a span[data-original-title]' — a
    # tooltip span directly under h3 (no <a>) falls back to h3 text
    html = card(
        '<h3 class="title"><span data-original-title="Tooltip">Visible</span></h3>'
    )
    assert one(html)["title"] == "Visible"


def test_job_id_fallback_skips_anchor_without_href():
    # reference: find('a', href=True) — the first bare <a> is skipped
    html = card(
        '<a class="x"></a><a href="/real-777.html"></a>'
        '<h3 class="title">Dev</h3>',
        attrs="",
    )
    j = one(html)
    assert j["job_id"] == "777"
    assert j["job_url"] == "https://www.topcv.vn/real-777.html"


def test_logo_anchor_img_without_src_falls_back():
    # reference checks has_attr('src') on the FIRST 'a img' only, then
    # falls back to img.img-responsive
    html = card(
        '<h3 class="title">Dev</h3>'
        '<a href="/x"><img class="lazy"></a>'
        '<img class="img-responsive" src="/fallback.png">'
    )
    assert one(html)["logo_url"] == "/fallback.png"


def test_script_content_not_parsed_as_markup():
    html = card(
        '<script>var s = "<div class=\'salary\'>99 triệu</div>";</script>'
        '<h3 class="title">Dev</h3>'
    )
    assert one(html)["salary"] is None


def test_nested_card_found_as_its_own_item():
    # bs4 find_all returns nested matches too (document order)
    html = (
        '<div class="job-item-2" data-job-id="10"><h3 class="title">Outer</h3>'
        '<div class="job-item-2" data-job-id="11"><h3 class="title">Inner</h3></div>'
        "</div>"
    )
    jobs = parse_job_cards(html, AS_OF)
    assert [(j["job_id"], j["title"]) for j in jobs] == [
        ("10", "Outer"),
        ("11", "Inner"),
    ]
