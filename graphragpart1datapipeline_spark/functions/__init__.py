from .text import (  # noqa: F401
    LATIN_SCRIPT_RE,
    doc_id_hash,
    format_list_natural,
    latin_script_filter,
    normalize_text,
    normalize_text_deep,
    qid_from_uri,
    sitelink_to_wikipedia_url,
    title_underscores_to_spaces,
    track_entry,
    year_from_date_string,
    year_from_wikidata_time,
)
