from blacklab_ray.query.reader import IndexReader, Segment
from blacklab_ray.query.multireader import MultiIndexReader, open_reader
from blacklab_ray.query.engine import search, search_taat, search_wand, phrase_search
from blacklab_ray.query import bm25
from blacklab_ray.query.service import (QueryService, QueryWorker,
                                        ShardedQueryService, ShardWorker)
