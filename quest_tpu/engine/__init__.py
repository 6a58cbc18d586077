from quest_tpu.engine.engine import QuestEngine

__all__ = ["QuestEngine"]
