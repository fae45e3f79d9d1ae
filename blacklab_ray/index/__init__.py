from blacklab_ray.index.build import BuildParams, build_index, Manifest
from blacklab_ray.index.postings import ExplodePostings, build_segments
from blacklab_ray.index.update import (
    add_documents, compact_index, delete_documents, merge_indexes,
    update_documents,
)
