from .corpus import CorpusSpec, build_corpus, build_facts, build_gazetteer

__all__ = ["CorpusSpec", "build_corpus", "build_facts", "build_gazetteer"]
