from .reference_shim import (  # noqa: F401
    IdentityError,
    SideTables,
    extract_doc_facts,
    dict_view_of_facts,
    gcn_extractors,
    atel_extractors,
    arxiv_extractors,
)
