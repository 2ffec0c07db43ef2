-- second shard
INSERT INTO `items` VALUES (4,'plain',2,2.5e2,'sci'),(5,'last',7,0.0001,'tiny');
