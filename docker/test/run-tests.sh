#!/bin/bash
# Mirrors the reference's docker/test/run-tests.sh: bring the stack up
# fresh, run the sut to completion, propagate its exit code.

export COMPOSE_FILE=docker-compose.test.yml
export COMPOSE_PROJECT_NAME=monstache_spark

docker compose down --remove-orphans
docker compose up --force-recreate --abort-on-container-exit --exit-code-from sut
