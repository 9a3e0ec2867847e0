"""Source readers / legacy-format sinks (SURVEY.md 2.1)."""
