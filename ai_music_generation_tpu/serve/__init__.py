from ai_music_generation_tpu.serve.engine import GenerationServer, Request

__all__ = ["GenerationServer", "Request"]
